"""Expert-driven NPC traffic (MixedPGTrafficManager).

Reference: metadrive/manager/traffic_manager.py:367-418 — with probability
``rl_agent_ratio`` a spawned traffic vehicle is controlled by ExpertPolicy
(the released PPO checkpoint) instead of IDMPolicy. The expert consumes the
275-dim LidarStateObservation, so each expert NPC here gets that observation
assembled batched over the [E, N] slot grid from its lane-following frame:

  boundary distances / lateral / heading-diff  -> from its current road
  navigation 2x5                               -> current lane end and the
                                                  successor lane end as the
                                                  two checkpoints
  nearest-4 vehicle features + 240-ray lidar   -> against all other NPCs and
                                                  the ego vehicle

Documented approximations vs the reference's per-object observation: NPCs do
not store an action/heading history, so the last-action dims are neutral 0.5
and the yaw-rate dim is 0; the lidar target set for NPC rays is vehicles
only (the driving-critical content).
"""
import jax.numpy as jnp

from metadrive_ped_tpu.ops import lane_geom, localization, raycast
from metadrive_ped_tpu.ops.math_ops import clip01, heading_vec, rhs_vec
from metadrive_ped_tpu.policies.expert import expert_action

TOTAL_SIDE_WIDTH = 18.0  # (MAX_LANE_NUM+1)*MAX_LANE_WIDTH (state_obs.py:90-98)
MAX_LANE_WIDTH = 4.5


def expert_npc_actions(scene, sidx, npc, ego, params, num_lasers=240,
                       distance=50.0, num_others=4):
    """Batched ExpertPolicy actions for every NPC slot -> [E, N, 2].

    Call it once per step and blend by scene.npc_expert inside the traffic
    kernel; inactive/IDM slots just waste a row of the same matmuls (lockstep
    discipline — no data-dependent shapes).
    """
    E, N = npc.lane.shape

    # ---- road frame -------------------------------------------------------
    g = lane_geom.gather_lane(scene, sidx, npc.lane)
    road_info = lane_geom.gather_road(scene, sidx, g["road"])
    lane0, nlanes = road_info["lane0"], road_info["nlanes"]
    g0 = lane_geom.gather_lane(scene, sidx, lane0)
    _, lat0 = lane_geom.local_coordinates(g0, npc.pos)
    w = g0["width"]
    left = lat0 + w / 2
    right = nlanes.astype(jnp.float32) * w - left
    f_left = clip01(left / TOTAL_SIDE_WIDTH)
    f_right = clip01(right / TOTAL_SIDE_WIDTH)

    # heading diff vs the rightmost lane (localization.heading_diff_ref
    # formula, batched [E, N])
    ref_last = lane0 + nlanes - 1
    gl = lane_geom.gather_lane(scene, sidx, ref_last)
    from metadrive_ped_tpu.constants import LANE_CIRCULAR
    is_circ = gl["kind"] == LANE_CIRCULAR
    delta = npc.pos - gl["p0"]
    radial = delta * jnp.sign(gl["arc_dir"])[..., None]
    straight_rhs = jnp.stack([gl["dirv"][..., 1], -gl["dirv"][..., 0]], axis=-1)
    lateral_dir = jnp.where(is_circ[..., None], radial, straight_rhs)
    lat_norm = jnp.sqrt((lateral_dir ** 2).sum(-1))
    hv = heading_vec(npc.heading)
    hdiff = jnp.clip((hv * lateral_dir).sum(-1) / jnp.maximum(lat_norm, 1e-6), -1, 1) / 2 + 0.5

    vmax = npc.params.max_speed_kmh
    f_speed = clip01((npc.speed * 3.6 + 1) / (vmax + 1))
    half = jnp.full((E, N), 0.5)
    _, lat_cur = lane_geom.local_coordinates(g, npc.pos)
    f_lat = clip01((lat_cur * 2 / MAX_LANE_WIDTH + 1) / 2)
    ego_state = jnp.stack(
        [f_left, f_right, hdiff, f_speed, half, half, half, jnp.zeros((E, N)), f_lat],
        axis=-1,
    )  # [E, N, 9]

    # ---- navigation 2x5: this road's end, then the successor road's end ---
    info1 = localization._checkpoint_info(g0, nlanes, w, npc.pos, npc.heading)
    succ_road = lane_geom.gather_lane(scene, sidx, g0["succ"])["road"]
    next_lane0 = lane_geom.gather_road(scene, sidx, succ_road)["lane0"]
    ref2 = jnp.where(g0["succ"] >= 0, next_lane0, lane0)
    g2 = lane_geom.gather_lane(scene, sidx, ref2)
    info2 = localization._checkpoint_info(g2, nlanes, w, npc.pos, npc.heading)
    navi = jnp.concatenate([info1, info2], axis=-1)  # [E, N, 10]

    # ---- vehicle targets: all NPCs + the ego -------------------------------
    cand_pos = jnp.concatenate([npc.pos, ego.pos[:, None]], axis=1)        # [E,N+1,2]
    cand_heading = jnp.concatenate([npc.heading, ego.heading[:, None]], axis=1)
    cand_len = jnp.concatenate([npc.params.length, ego.params.length[:, None]], axis=1)
    cand_wid = jnp.concatenate([npc.params.width, ego.params.width[:, None]], axis=1)
    cand_active = jnp.concatenate(
        [npc.active, jnp.ones((E, 1), bool)], axis=1
    )
    cand_speed = jnp.concatenate([npc.speed, ego.speed[:, None]], axis=1)
    cand_move = jnp.concatenate(
        [npc.heading + npc.vel_dir, (ego.heading + ego.vel_dir)[:, None]], axis=1
    )
    C = N + 1
    not_self = ~jnp.eye(N, C, dtype=bool)[None]                            # [1,N,C]

    # nearest-K relative features (lidar.py:93-138), per NPC
    from metadrive_ped_tpu.ops.gather import nearest_k_onehot
    delta2 = cand_pos[:, None, :, :] - npc.pos[:, :, None, :]              # [E,N,C,2]
    dist = jnp.sqrt((delta2 ** 2).sum(-1))
    dist = jnp.where(cand_active[:, None, :] & not_self, dist, jnp.inf)
    oh, found_k = nearest_k_onehot(dist, min(num_others, C))               # [E,N,K,C]
    sel = lambda a: jnp.einsum("enkc,enc->enk", oh, a)
    sel_dist = sel(jnp.where(jnp.isfinite(dist), dist, 0.0))
    found = found_k & (sel_dist <= distance)
    # LEFT-positive lateral axis (reference convert_to_local_coordinates
    # convention; see localization._checkpoint_info) — the expert consumes
    # these, so the sign must match its training-time raw obs
    rv = -rhs_vec(npc.heading)
    dx = sel(delta2[..., 0])
    dy = sel(delta2[..., 1])
    rel_x = dx * hv[..., None, 0] + dy * hv[..., None, 1]
    rel_y = dx * rv[..., None, 0] + dy * rv[..., None, 1]
    vx = cand_speed * 3.6 * jnp.cos(cand_move)
    vy = cand_speed * 3.6 * jnp.sin(cand_move)
    mvx = (npc.speed * 3.6 * jnp.cos(npc.heading + npc.vel_dir))[..., None]
    mvy = (npc.speed * 3.6 * jnp.sin(npc.heading + npc.vel_dir))[..., None]
    dvx = sel(jnp.broadcast_to(vx[:, None], dist.shape)) - mvx
    dvy = sel(jnp.broadcast_to(vy[:, None], dist.shape)) - mvy
    rvx = dvx * hv[..., None, 0] + dvy * hv[..., None, 1]
    rvy = dvx * rv[..., None, 0] + dvy * rv[..., None, 1]
    feats = jnp.stack(
        [
            clip01((rel_x / distance + 1) / 2),
            clip01((rel_y / distance + 1) / 2),
            clip01((rvx / vmax[..., None] + 1) / 2),
            clip01((rvy / vmax[..., None] + 1) / 2),
        ],
        axis=-1,
    )
    feats = jnp.where(found[..., None], feats, 0.0).reshape(E, N, -1)      # [E,N,K*4]
    K = min(num_others, C)
    if K < num_others:
        feats = jnp.concatenate([feats, jnp.zeros((E, N, (num_others - K) * 4))], axis=-1)

    # ---- per-NPC lidar vs the vehicle targets ------------------------------
    B = E * N
    rep = lambda a: jnp.repeat(a, N, axis=0)                               # [E,..]->[E*N,..]
    active_f = rep(cand_active) & not_self.reshape(1, N, C).repeat(E, 0).reshape(B, C)
    cloud = raycast.lidar_cloud(
        npc.pos.reshape(B, 2), npc.heading.reshape(B), num_lasers, distance,
        rep(cand_pos), rep(cand_heading), rep(cand_len), rep(cand_wid), active_f,
    ).reshape(E, N, num_lasers)

    obs = jnp.concatenate([ego_state, navi, feats, cloud], axis=-1)        # [E,N,275]
    actions = expert_action(params, obs.reshape(B, -1)).reshape(E, N, 2)
    return jnp.clip(actions, -1.0, 1.0)
