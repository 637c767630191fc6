"""Batched pinhole camera rendering on TPU (depth / semantic / instance / RGB).

The reference renders camera observations with OpenGL + GLSL shaders through
Panda3D offscreen buffers (component/sensors/base_camera.py:22-95,
rgb_camera.py, depth_cam.frag.glsl, semantic camera via the engine's
object-id color registry, base_engine.py:23-35). None of that exists on TPU;
instead every pixel is an analytic ray cast against the same scene arrays the
physics uses:

  ground plane z=0   -> classified ROAD / LANE_LINE / SIDEWALK / TERRAIN by
                        distance to lane centerlines and boundary segments
  target boxes       -> vehicles, traffic objects, buildings, pedestrians
                        (3D slab tests against heading-aligned boxes)
  no hit             -> SKY

Everything is closed-form, branchless, and batched [E, H*W, ...], so a whole
fleet of cameras renders inside one jit. Resolution is static; the pixel x
primitive contractions fuse into large reduces that map well onto the VPU.
This is a flat-shaded sensor-simulation renderer (semantic/depth/instance
parity), not a photoreal PBR renderer (the reference's render_pipeline is
explicitly out of scope, SURVEY §2.1).
"""
import jax.numpy as jnp
import numpy as np

from metadrive_ped_tpu.constants import SEG_SIDEWALK, SEG_WHITE_LINE, SEG_YELLOW_LINE
from metadrive_ped_tpu.ops import lane_geom

# semantic class ids (palette below follows constants.py:372-392 Semantics)
SEM_SKY = 0
SEM_ROAD = 1
SEM_LANE_LINE = 2
SEM_SIDEWALK = 3
SEM_TERRAIN = 4
SEM_CAR = 5
SEM_PEDESTRIAN = 6
SEM_OBJECT = 7    # cones/warnings/barriers -> TRAFFIC_SIGN-ish
SEM_BUILDING = 8  # toll booth -> FENCE color
NUM_SEM = 9

SEMANTIC_PALETTE = np.array(
    [
        (70, 130, 180),    # SKY
        (128, 64, 128),    # ROAD
        (255, 255, 255),   # LANE_LINE
        (244, 35, 232),    # SIDEWALK
        (152, 251, 152),   # TERRAIN
        (0, 0, 142),       # CAR
        (220, 20, 60),     # PEDESTRIAN
        (220, 220, 0),     # TRAFFIC_SIGN / objects
        (190, 153, 153),   # FENCE / buildings
    ],
    np.float32,
) / 255.0

FAR = 1e6


def pixel_rays(heading, width, height, fov_deg, pitch_deg, cam_height):
    """World-frame ray origins/directions for an [E] batch of cameras.

    Returns (origin_z scalar, dirs [E, P, 3]) with P = height*width; +z up.
    """
    fov = jnp.radians(fov_deg)
    aspect = height / width
    xs = (jnp.arange(width) + 0.5) / width    # 0..1 across image
    ys = (jnp.arange(height) + 0.5) / height
    tan_half = jnp.tan(fov / 2)
    cam_y = (0.5 - xs) * 2 * tan_half                 # +y = left
    cam_z = (0.5 - ys) * 2 * tan_half * aspect        # +z = up
    yy, zz = jnp.meshgrid(cam_y, cam_z)               # [H, W]
    ones = jnp.ones_like(yy)
    d = jnp.stack([ones, yy, zz], axis=-1).reshape(-1, 3)  # [P, 3] camera frame
    # pitch around the camera's y axis (down-tilt positive)
    p = jnp.radians(pitch_deg)
    dx = d[:, 0] * jnp.cos(p) + d[:, 2] * jnp.sin(p)
    dz = -d[:, 0] * jnp.sin(p) + d[:, 2] * jnp.cos(p)
    d = jnp.stack([dx, d[:, 1], dz], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # rotate into world by heading
    ch, sh = jnp.cos(heading), jnp.sin(heading)       # [E]
    wx = ch[:, None] * d[None, :, 0] - sh[:, None] * d[None, :, 1]
    wy = sh[:, None] * d[None, :, 0] + ch[:, None] * d[None, :, 1]
    wz = jnp.broadcast_to(d[None, :, 2], wx.shape)
    return jnp.stack([wx, wy, wz], axis=-1)           # [E, P, 3]


def _ground_hit(scene, sidx, origin_xy, cam_h, dirs, line_probe_dist):
    """Ray vs z=0 plane + semantic classification of the hit point."""
    dz = dirs[..., 2]
    t = jnp.where(dz < -1e-6, -cam_h / dz, FAR)       # [E, P]
    px = origin_xy[:, None, 0] + t * dirs[..., 0]
    py = origin_xy[:, None, 1] + t * dirs[..., 1]
    p = jnp.stack([px, py], axis=-1)                  # [E, P, 2]

    # on-road: within half-width of any lane's centerline span
    g = lane_geom.gather_all_lanes(scene, sidx)       # fields [E, L]
    gb = {k: v[:, None] for k, v in g.items()}        # broadcast over pixels
    long, lat = _lane_local(gb, p)
    on_road = (
        (long >= 0) & (long <= gb["length"]) & (jnp.abs(lat) <= gb["width"] / 2)
        & (gb["length"] > 1e-3)
    ).any(axis=-1)                                    # [E, P]

    # segment distances (lane lines / sidewalks)
    seg_p0 = scene.seg_p0[sidx][:, None]              # [E, 1, B, 2]
    seg_p1 = scene.seg_p1[sidx][:, None]
    seg_type = scene.seg_type[sidx][:, None]
    seg_hw = scene.seg_halfwidth[sidx][:, None]
    seg_valid = scene.seg_valid[sidx][:, None]
    ab = seg_p1 - seg_p0
    ap = p[:, :, None, :] - seg_p0
    denom = jnp.maximum((ab * ab).sum(-1), 1e-9)
    tt = jnp.clip((ap * ab).sum(-1) / denom, 0.0, 1.0)
    close = seg_p0 + tt[..., None] * ab
    dseg = jnp.sqrt(((p[:, :, None, :] - close) ** 2).sum(-1))  # [E, P, B]
    near = (dseg <= seg_hw + line_probe_dist) & seg_valid
    is_line = (near & ((seg_type == SEG_YELLOW_LINE) | (seg_type == SEG_WHITE_LINE))).any(-1)
    is_walk = (near & (seg_type == SEG_SIDEWALK)).any(-1)

    sem = jnp.where(
        is_walk, SEM_SIDEWALK,
        jnp.where(is_line, SEM_LANE_LINE, jnp.where(on_road, SEM_ROAD, SEM_TERRAIN)),
    )
    return t, sem


def _lane_local(gb, p):
    """local_coordinates broadcast to [E, P, L]: gb fields [E, 1, L] scalars /
    [E, 1, L, 2] vectors vs points p [E, P, 2]."""
    g2 = {}
    for k, v in gb.items():
        g2[k] = v  # [E, 1, L(, 2)] broadcasts against [E, P, 1(, 2)]
    return lane_geom.local_coordinates(g2, p[:, :, None, :])


def _box_hits(origin_xy, cam_h, dirs, t_pos, t_heading, t_len, t_wid, t_hgt, t_active):
    """Nearest-hit t against heading-aligned 3D boxes. Returns (t [E,P], idx [E,P])."""
    rel = t_pos - origin_xy[:, None, :]               # [E, T, 2]
    ch, sh = jnp.cos(t_heading), jnp.sin(t_heading)
    # origin in box frame
    ox = rel[..., 0] * ch + rel[..., 1] * sh
    oy = -rel[..., 0] * sh + rel[..., 1] * ch
    ox, oy = -ox, -oy                                 # origin relative to box center
    dx = dirs[..., None, 0] * ch[:, None] + dirs[..., None, 1] * sh[:, None]
    dy = -dirs[..., None, 0] * sh[:, None] + dirs[..., None, 1] * ch[:, None]
    dz = dirs[..., None, 2]                           # [E, P, 1] -> broadcast [E,P,T]

    def slab(o, d, lo, hi):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    hx = t_len[:, None] / 2
    hy = t_wid[:, None] / 2
    n1, f1 = slab(ox[:, None], dx, -hx, hx)
    n2, f2 = slab(oy[:, None], dy, -hy, hy)
    n3, f3 = slab(jnp.full_like(dz, cam_h), dz, jnp.zeros_like(hx), t_hgt[:, None])
    tnear = jnp.maximum(jnp.maximum(n1, n2), jnp.maximum(n3, 0.0))
    tfar = jnp.minimum(jnp.minimum(f1, f2), f3)
    hit = (tfar >= tnear) & t_active[:, None]
    tval = jnp.where(hit, tnear, FAR)                 # [E, P, T]
    tbest = tval.min(axis=-1)
    # argmin via compare-to-min (avoids scalar-gather argmin lowering issues)
    isbest = tval <= tbest[..., None] + 1e-6
    idx = jnp.argmax(isbest, axis=-1)
    return tbest, idx


def render(scene, sidx, ego, targets, kinds, obj_kind, *, width=84, height=84,
           fov_deg=66.0, pitch_deg=0.0, cam_height=1.4, max_dist=50.0):
    """Render all camera modalities at once.

    targets/kinds come from BaseVectorEnv._lidar_targets: every visible body
    (NPCs, static objects incl. buildings, pedestrians, other agents).
    Returns dict(depth [E,H,W,1], semantic [E,H,W,3], rgb [E,H,W,3],
    instance [E,H,W,3]) all float32 in [0,1].
    """
    from metadrive_ped_tpu.mapgen.scene import OBJ_BUILDING

    E = ego.pos.shape[0]
    dirs = pixel_rays(ego.heading, width, height, fov_deg, pitch_deg, cam_height)
    # camera sits over the windshield: 1/4 vehicle length ahead of center
    fwd = jnp.stack([jnp.cos(ego.heading), jnp.sin(ego.heading)], axis=-1)
    origin_xy = ego.pos + 0.25 * ego.params.length[:, None] * fwd

    t_ground, ground_sem = _ground_hit(scene, sidx, origin_xy, cam_height, dirs, 0.0)

    t_pos, t_heading, t_len, t_wid, t_active = targets
    # per-target heights and semantic classes by kind slice
    T = t_pos.shape[1]
    t_hgt = jnp.full((E, T), 1.5)
    t_sem = jnp.full((E, T), SEM_CAR, jnp.int32)
    oslice = kinds["obj"]
    is_building = obj_kind == OBJ_BUILDING
    obj_hgt = jnp.where(is_building, 5.0, 1.0)
    obj_sem = jnp.where(is_building, SEM_BUILDING, SEM_OBJECT)
    t_hgt = t_hgt.at[:, oslice].set(obj_hgt)
    t_sem = t_sem.at[:, oslice].set(obj_sem)
    pslice = kinds["ped"]
    t_hgt = t_hgt.at[:, pslice].set(1.75)
    t_sem = t_sem.at[:, pslice].set(SEM_PEDESTRIAN)

    t_box, box_idx = _box_hits(
        origin_xy, cam_height, dirs, t_pos, t_heading, t_len, t_wid, t_hgt, t_active
    )

    box_wins = t_box < t_ground
    t_hit = jnp.where(box_wins, t_box, t_ground)
    hit = t_hit < FAR / 2

    # one-hot pick of per-target semantic/instance values (no scalar gather)
    oh = (box_idx[..., None] == jnp.arange(T)).astype(jnp.float32)  # [E, P, T]
    box_sem = jnp.einsum("ept,et->ep", oh, t_sem.astype(jnp.float32)).astype(jnp.int32)
    sem = jnp.where(box_wins, box_sem, ground_sem)
    sem = jnp.where(hit, sem, SEM_SKY)

    depth = jnp.clip(t_hit / max_dist, 0.0, 1.0)
    H, W = height, width
    depth_img = depth.reshape(E, H, W, 1)

    palette = jnp.asarray(SEMANTIC_PALETTE)
    sem_oh = (sem[..., None] == jnp.arange(NUM_SEM)).astype(jnp.float32)
    sem_img = (sem_oh @ palette).reshape(E, H, W, 3)

    # flat shading: semantic color attenuated by distance; sky unshaded
    shade = jnp.where(hit, 1.0 / (1.0 + 0.02 * t_hit), 1.0)
    rgb_img = (sem_oh @ palette * shade[..., None]).reshape(E, H, W, 3)

    # instance: unique color per target slot (id->color registry analog,
    # base_engine.py:160-208); background black
    inst_colors = jnp.stack(
        [
            ((jnp.arange(T) * 37 + 13) % 255) / 255.0,
            ((jnp.arange(T) * 91 + 71) % 255) / 255.0,
            ((jnp.arange(T) * 53 + 29) % 255) / 255.0,
        ],
        axis=-1,
    )  # [T, 3]
    inst = (oh @ inst_colors) * (box_wins & hit)[..., None]
    inst_img = inst.reshape(E, H, W, 3)

    return dict(depth=depth_img, semantic=sem_img, rgb=rgb_img, instance=inst_img)
