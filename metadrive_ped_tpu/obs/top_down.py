"""Top-down (BEV) observation.

TPU-native counterpart of the reference's pygame rasterized observation
(obs/top_down_obs.py:22 TopDownObservation, 84x84;
obs/top_down_obs_multi_channel.py:27 TopDownMultiChannel). Static map layers
(drivable area, lane lines, ego route) are baked per scenario at env init by
the native C++ rasterizer (native/td_raster.cpp); per step the ego-centric
window is sampled on-device (rotated bilinear crop via map_coordinates) and
dynamic layers (ego box, other vehicles, past ego positions) are stamped
with batched point-in-OBB tests.

Channels (mirroring the multi-channel layout):
  0 road network   1 ego route   2 other vehicles   3 ego box
  4 past ego positions
"""
import jax
import jax.numpy as jnp
import numpy as np

from metadrive_ped_tpu.constants import LANE_CIRCULAR

CHANNELS = 5
BAKE_RES = 0.5  # m / texture pixel


def bake_map_textures(scene_pack, num_scenarios):
    """Host-side: per-scenario [3, H, W] static layers + origins.

    Layers: 0 drivable area, 1 continuous lane lines, 2 slot-0 route.
    """
    from metadrive_ped_tpu.native import rasterize_polylines

    textures, origins = [], []
    S = num_scenarios
    for s in range(S):
        valid = np.asarray(scene_pack["lane_valid"][s])
        pts_all = []
        lane_polys = []
        widths = []
        for lid in np.nonzero(valid)[0]:
            poly = _lane_centerline(scene_pack, s, lid)
            lane_polys.append(poly)
            widths.append(float(scene_pack["lane_width"][s][lid]))
            pts_all.append(poly)
        allpts = np.concatenate(pts_all) if pts_all else np.zeros((1, 2))
        lo = allpts.min(axis=0) - 12.0
        hi = allpts.max(axis=0) + 12.0
        H = int(np.ceil((hi[1] - lo[1]) / BAKE_RES))
        W = int(np.ceil((hi[0] - lo[0]) / BAKE_RES))
        tex = np.zeros((3, H, W), np.float32)
        rasterize_polylines(tex[0], lo, BAKE_RES, lane_polys, widths)
        # continuous lines from the segment arrays
        segs = []
        for b in range(len(scene_pack["seg_valid"][s])):
            if not scene_pack["seg_valid"][s][b]:
                continue
            if scene_pack["seg_type"][s][b] > 2:
                continue
            segs.append(np.stack([scene_pack["seg_p0"][s][b], scene_pack["seg_p1"][s][b]]))
        rasterize_polylines(tex[1], lo, BAKE_RES, segs, [0.6] * len(segs))
        # route (slot 0)
        route = scene_pack["route_roads"][s][0][: scene_pack["route_len"][s][0]]
        route_polys, route_widths = [], []
        for rid in route:
            lane0 = int(scene_pack["road_lane0"][s][rid])
            n = int(scene_pack["road_nlanes"][s][rid])
            for lid in range(lane0, lane0 + n):
                route_polys.append(_lane_centerline(scene_pack, s, lid))
                route_widths.append(float(scene_pack["lane_width"][s][lid]))
        rasterize_polylines(tex[2], lo, BAKE_RES, route_polys, route_widths)
        textures.append(tex)
        origins.append(lo)

    Hm = max(t.shape[1] for t in textures)
    Wm = max(t.shape[2] for t in textures)
    out = np.zeros((S, 3, Hm, Wm), np.float32)
    for s, t in enumerate(textures):
        out[s, :, : t.shape[1], : t.shape[2]] = t
    return jnp.asarray(out), jnp.asarray(np.asarray(origins, np.float32))


def _lane_centerline(pack, s, lid, step=3.0):
    if pack["lane_kind"][s][lid] == LANE_CIRCULAR:
        c = np.asarray(pack["lane_p0"][s][lid])
        r = float(pack["lane_radius"][s][lid])
        phi0 = float(pack["lane_start_phase"][s][lid])
        d = float(pack["lane_arc_dir"][s][lid])
        length = float(pack["lane_length"][s][lid])
        n = max(2, int(length / step))
        longs = np.linspace(0, length, n)
        phis = d * longs / r + phi0
        return (c[None] + r * np.stack([np.cos(phis), np.sin(phis)], -1)).astype(np.float32)
    p0 = np.asarray(pack["lane_p0"][s][lid])
    dirv = np.asarray(pack["lane_dir"][s][lid])
    length = float(pack["lane_length"][s][lid])
    return np.stack([p0, p0 + dirv * length]).astype(np.float32)


def observe_top_down(textures, origins, sidx, ego, npc, past_pos,
                     resolution=84, max_distance=50.0):
    """[E, resolution, resolution, 5] ego-centric BEV, heading pointing up
    (+row towards the front, matching the reference's rotated frame)."""
    E = sidx.shape[0]
    R = resolution
    res = 2 * max_distance / R

    # pixel grid in ego frame: row 0 = furthest ahead
    ii = jnp.arange(R)
    fwd = (R / 2 - ii) * res          # forward distance
    side = (jnp.arange(R) - R / 2) * res
    fwd_g, side_g = jnp.meshgrid(fwd, side, indexing="ij")  # [R,R]

    hv = jnp.stack([jnp.cos(ego.heading), jnp.sin(ego.heading)], -1)  # [E,2]
    rv = jnp.stack([hv[:, 1], -hv[:, 0]], -1)
    world = (
        ego.pos[:, None, None, :]
        + fwd_g[None, ..., None] * hv[:, None, None, :]
        + side_g[None, ..., None] * rv[:, None, None, :]
    )  # [E,R,R,2]

    tex_xy = (world - origins[sidx][:, None, None, :]) / BAKE_RES
    s_coord = jnp.broadcast_to(
        sidx[:, None, None].astype(jnp.float32), (E, R, R)
    )
    coords = jnp.stack([s_coord, tex_xy[..., 1], tex_xy[..., 0]], axis=0).reshape(3, -1)

    def sample(ch):
        return jax.scipy.ndimage.map_coordinates(
            textures[:, ch], [coords[0], coords[1], coords[2]], order=1, mode="constant"
        ).reshape(E, R, R)

    road = sample(0)
    lines = sample(1)
    route = sample(2)
    road = jnp.maximum(road, lines * 0.5)  # lane lines over drivable area

    # dynamic stamping: other vehicles as OBBs in the ego frame
    stamp = lambda *a: _stamp_obbs(fwd_g, side_g, hv, rv, ego, *a)
    others = stamp(npc.pos, npc.heading, npc.params.length, npc.params.width, npc.active)
    ego_layer = stamp(
        ego.pos[:, None, :], ego.heading[:, None], ego.params.length[:, None],
        ego.params.width[:, None], jnp.ones((E, 1), bool),
    )
    # past ego positions as dots (top_down_obs_multi_channel past-pos layer)
    past = stamp(
        past_pos, jnp.zeros(past_pos.shape[:2]),
        jnp.full(past_pos.shape[:2], 1.0), jnp.full(past_pos.shape[:2], 1.0),
        jnp.ones(past_pos.shape[:2], bool),
    )
    return jnp.stack([road, route, others, ego_layer, past], axis=-1)


def _stamp_obbs(fwd_g, side_g, hv, rv, ego, pos, heading, length, wid, active):
    """Rasterize rotated boxes into the ego-frame pixel grid
    (fwd_g/side_g [H,W]); returns the occupancy layer [E,H,W]."""
    rel = pos - ego.pos[:, None, :]                       # [E,N,2]
    rx = (rel * hv[:, None, :]).sum(-1)
    ry = (rel * rv[:, None, :]).sum(-1)
    rel_h = heading - ego.heading[:, None]
    c, s = jnp.cos(rel_h), jnp.sin(rel_h)
    # pixel offsets relative to each body center, in that body's frame
    dxp = fwd_g[None, :, :, None] - rx[:, None, None, :]  # [E,H,W,N]
    dyp = side_g[None, :, :, None] - ry[:, None, None, :]
    lx = dxp * c[:, None, None, :] + dyp * s[:, None, None, :]
    ly = -dxp * s[:, None, None, :] + dyp * c[:, None, None, :]
    inside = (
        (jnp.abs(lx) <= length[:, None, None, :] / 2)
        & (jnp.abs(ly) <= wid[:, None, None, :] / 2)
        & active[:, None, None, :]
    )
    return inside.any(-1).astype(jnp.float32)


def observe_mini_map(textures, origins, sidx, ego, npc, width=168, height=84,
                     max_distance=50.0, look_ahead=20.0):
    """MiniMap sensor frame [E, height, width, 3] (reference:
    component/sensors/mini_map.py — an orthographic camera hovering above
    the vehicle, aimed 20 m ahead, aspect 2:1; physics-mode analog rendered
    from the baked map textures instead of the Panda3D scene graph).

    Channels: road surface (+lane lines), all vehicles (ego + others),
    navigation route — a pseudo-RGB the image_observation pipeline stacks
    like any camera."""
    E = sidx.shape[0]
    res = 2 * max_distance / height
    ii = jnp.arange(height)
    fwd = (height / 2 - ii) * res + look_ahead       # view centered ahead
    side = (jnp.arange(width) - width / 2) * res
    fwd_g, side_g = jnp.meshgrid(fwd, side, indexing="ij")   # [H,W]

    hv = jnp.stack([jnp.cos(ego.heading), jnp.sin(ego.heading)], -1)
    rv = jnp.stack([hv[:, 1], -hv[:, 0]], -1)
    world = (
        ego.pos[:, None, None, :]
        + fwd_g[None, ..., None] * hv[:, None, None, :]
        + side_g[None, ..., None] * rv[:, None, None, :]
    )
    tex_xy = (world - origins[sidx][:, None, None, :]) / BAKE_RES
    s_coord = jnp.broadcast_to(
        sidx[:, None, None].astype(jnp.float32), (E, height, width)
    )
    coords = jnp.stack(
        [s_coord, tex_xy[..., 1], tex_xy[..., 0]], axis=0
    ).reshape(3, -1)

    def sample(ch):
        return jax.scipy.ndimage.map_coordinates(
            textures[:, ch], [coords[0], coords[1], coords[2]], order=1,
            mode="constant",
        ).reshape(E, height, width)

    road = jnp.maximum(sample(0), sample(1) * 0.5)
    route = sample(2)

    stamp = lambda *a: _stamp_obbs(fwd_g, side_g, hv, rv, ego, *a)
    cars = jnp.maximum(
        stamp(npc.pos, npc.heading, npc.params.length, npc.params.width,
              npc.active),
        stamp(ego.pos[:, None, :], ego.heading[:, None],
              ego.params.length[:, None], ego.params.width[:, None],
              jnp.ones((E, 1), bool)),
    )
    return jnp.stack([road, cars, route], axis=-1)
