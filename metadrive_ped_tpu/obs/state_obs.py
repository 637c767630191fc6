"""Batched state + lidar observation assembly.

Reproduces the reference's LidarStateObservation layout exactly
(metadrive/obs/state_obs.py):

  [0:2]    lateral distance to route left/right boundary, / ((MAX_LANE_NUM+1)
           * MAX_LANE_WIDTH) = /18 (state_obs.py:90-98; base_map.py:38-40)
  [2]      heading_diff vs rightmost current ref lane (state_obs.py:104-108)
  [3]      (speed_km_h + 1) / (max_speed_km_h + 1)        (state_obs.py:111)
  [4]      (steering/MAX_STEERING + 1) / 2, MAX_STEERING=60 (state_obs.py:114)
  [5:7]    (last action + 1)/2 — the action applied THIS step
           (state_obs.py:117-118 reads last_current_action[1])
  [7]      yaw rate = arccos(clip(cos<heading_t, heading_{t-1}>,0,1))/0.1
           (state_obs.py:121-127)
  [8]      (lateral*2/MAX_LANE_WIDTH + 1)/2 on the current lane
           (state_obs.py:142-149)
  [9:19]   navigation 2x5 (node_network_navigation.py:243-292)
  [19:19+num_lasers]  lidar hit fractions (state_obs.py:210-232)
"""
import jax
import jax.numpy as jnp

from metadrive_ped_tpu.constants import OBS_MAX_STEERING
from metadrive_ped_tpu.ops import localization, raycast
from metadrive_ped_tpu.ops.math_ops import clip01, heading_vec

TOTAL_SIDE_WIDTH = (3 + 1) * 4.5  # (MAX_LANE_NUM+1)*MAX_LANE_WIDTH = 18
MAX_LANE_WIDTH = 4.5
# BaseVehicle.MAX_LENGTH / MAX_WIDTH (base_vehicle.py:78-79), the
# random_agent_model size-feature normalizers
MAX_VEHICLE_LENGTH = 10.0
MAX_VEHICLE_WIDTH = 2.5

EGO_STATE_DIM = 9
NAVI_DIM = 10


def obs_dim(num_lasers, num_others=0, side_lasers=0, lane_line_lasers=0,
            random_agent_model=False):
    """Observation width. Mirrors StateObservation.get_line_detector_dim
    (state_obs.py:153-159): side-detector cloud replaces the 2 lateral
    road-border features, lane-line cloud replaces the 1 lateral-offset
    feature; random_agent_model prepends vehicle length/width
    (state_obs.py:69-75)."""
    ego = EGO_STATE_DIM
    if side_lasers > 0:
        ego += side_lasers - 2
    if lane_line_lasers > 0:
        ego += lane_line_lasers - 1
    if random_agent_model:
        ego += 2
    return ego + NAVI_DIM + num_others * 4 + num_lasers


def surrounding_vehicles_info(ego, npc, num_others, perceive_distance):
    """4 features per nearest-K NPC vehicle: relative position and relative
    velocity (km/h), both projected into the ego frame and normalized
    (reference: lidar.py:93-138 get_surrounding_vehicles_info)."""
    from metadrive_ped_tpu.ops.gather import nearest_k_onehot

    delta = npc.pos - ego.pos[:, None, :]                      # [E,N,2]
    dist = jnp.sqrt((delta ** 2).sum(-1))
    dist = jnp.where(npc.active, dist, jnp.inf)
    k = min(num_others, dist.shape[1])  # fewer NPC slots than K -> pad below
    oh, found_k = nearest_k_onehot(dist, k)                    # [E,K,N], [E,K]
    sel_dist = jnp.einsum("ekn,en->ek", oh, jnp.where(jnp.isfinite(dist), dist, 0.0))
    found = found_k & (sel_dist <= perceive_distance)

    hv = heading_vec(ego.heading)                              # [E,2]
    # lateral axis = LEFT-positive: the reference projects neighbors with
    # convert_to_local_coordinates (lidar.py:108,114 -> base_vehicle.py:
    # 986-988), whose second component is the left-hand side (the "+y is
    # rhs" comment there is stale) — see localization._checkpoint_info
    rv = jnp.stack([-hv[..., 1], hv[..., 0]], axis=-1)
    sel = lambda a: jnp.einsum("ekn,en->ek", oh, a)
    dx = sel(delta[..., 0])
    dy = sel(delta[..., 1])
    rel_x = dx * hv[:, None, 0] + dy * hv[:, None, 1]
    rel_y = dx * rv[:, None, 0] + dy * rv[:, None, 1]

    move_dir = npc.heading + npc.vel_dir
    vx = npc.speed * 3.6 * jnp.cos(move_dir) - (ego.speed * 3.6 * jnp.cos(ego.heading + ego.vel_dir))[:, None]
    vy = npc.speed * 3.6 * jnp.sin(move_dir) - (ego.speed * 3.6 * jnp.sin(ego.heading + ego.vel_dir))[:, None]
    rvx = sel(vx) * hv[:, None, 0] + sel(vy) * hv[:, None, 1]
    rvy = sel(vx) * rv[:, None, 0] + sel(vy) * rv[:, None, 1]

    vmax = ego.params.max_speed_kmh[:, None]
    feats = jnp.stack(
        [
            clip01((rel_x / perceive_distance + 1) / 2),
            clip01((rel_y / perceive_distance + 1) / 2),
            clip01((rvx / vmax + 1) / 2),
            clip01((rvy / vmax + 1) / 2),
        ],
        axis=-1,
    )  # [E,K,4]
    feats = jnp.where(found[..., None], feats, 0.0)
    E = feats.shape[0]
    feats = feats.reshape(E, k * 4)
    if k < num_others:
        feats = jnp.concatenate([feats, jnp.zeros((E, (num_others - k) * 4))], axis=-1)
    return feats


def observe(scene, sidx, ego, targets, ego_long, ego_lat, num_lasers=240, lidar_distance=50.0,
            num_others=0, npc=None, gaussian_noise=0.0, dropout_prob=0.0, rng=None,
            side_lasers=0, side_distance=50.0,
            lane_line_lasers=0, lane_line_distance=20.0, line_segs=None,
            random_agent_model=False, t_radius=None, circle_slice=None):
    """Full observation [E, 19 + num_others*4 + num_lasers]. ego_long/ego_lat
    are the current-lane local coordinates already computed by localization;
    ``targets`` = (pos, heading, length, width, active) arrays [E,T,...] of
    every lidar-visible body (vehicles + traffic objects + participants —
    the reference lidar mask, lidar.py:28 + constants.py:242-244);
    num_others>0 adds nearest-K vehicle features (needs npc).

    side_lasers/lane_line_lasers > 0 switch the lateral features to detector
    clouds against the lane-line segment arrays, matching the reference's
    SideDetector (ContinuousLaneLine mask, distance_detector.py:194) and
    LaneLineDetector (both line masks, :209); ``line_segs`` =
    (p0, p1, continuous_valid, any_line_valid) [E,B,...]."""
    left, right = localization.boundary_distances(scene, sidx, ego.slot, ego.route_idx, ego.pos)
    f_left = clip01(left / TOTAL_SIDE_WIDTH)
    f_right = clip01(right / TOTAL_SIDE_WIDTH)

    hdiff = localization.heading_diff_ref(scene, sidx, ego.slot, ego.route_idx, ego.pos, ego.heading)

    speed_kmh = ego.speed * 3.6
    f_speed = clip01((speed_kmh + 1) / (ego.params.max_speed_kmh + 1))
    f_steer = clip01((ego.steering / OBS_MAX_STEERING + 1) / 2)
    f_act0 = clip01((ego.current_action[:, 0] + 1) / 2)
    f_act1 = clip01((ego.current_action[:, 1] + 1) / 2)

    hv_now = heading_vec(ego.heading)
    hv_last = heading_vec(ego.last_heading)
    cos_beta = (hv_now * hv_last).sum(-1)
    yaw_rate = jnp.arccos(jnp.clip(cos_beta, 0.0, 1.0)) / 0.1
    f_yaw = clip01(yaw_rate)

    f_lat = clip01((ego_lat * 2 / MAX_LANE_WIDTH + 1) / 2)

    pieces = []
    if random_agent_model:
        pieces.append(jnp.stack(
            [clip01(ego.params.length / MAX_VEHICLE_LENGTH),
             clip01(ego.params.width / MAX_VEHICLE_WIDTH)], axis=-1))
    if side_lasers > 0:
        p0, p1, cont_valid, _ = line_segs
        pieces.append(raycast.side_detector_cloud(
            ego.pos, ego.heading, side_lasers, side_distance, p0, p1, cont_valid))
    else:
        pieces.append(jnp.stack([f_left, f_right], axis=-1))
    pieces.append(jnp.stack(
        [hdiff, f_speed, f_steer, f_act0, f_act1, f_yaw], axis=-1))
    if lane_line_lasers > 0:
        p0, p1, _, any_valid = line_segs
        pieces.append(raycast.side_detector_cloud(
            ego.pos, ego.heading, lane_line_lasers, lane_line_distance, p0, p1, any_valid))
    else:
        pieces.append(f_lat[:, None])
    ego_state = jnp.concatenate(pieces, axis=-1)

    navi = localization.navi_info(scene, sidx, ego.slot, ego.route_idx, ego.pos, ego.heading)

    parts = [ego_state, navi]
    if num_others > 0:
        parts.append(surrounding_vehicles_info(ego, npc, num_others, lidar_distance))
    # lidar-off configs skip the cloud entirely, like the reference's
    # LidarStateObservation (state_obs.py:210-232 only appends rays when
    # lidar.num_lasers > 0)
    if num_lasers > 0:
        t_pos, t_heading, t_len, t_wid, t_active = targets
        cloud = raycast.lidar_cloud(
            ego.pos, ego.heading, num_lasers, lidar_distance,
            t_pos, t_heading, t_len, t_wid, t_active, radius=t_radius,
            circle_slice=circle_slice,
        )
        # gaussian noise / dropout on the cloud (LidarStateObservation
        # _add_noise_to_cloud_points, state_obs.py:234-244)
        if (gaussian_noise > 0 or dropout_prob > 0) and rng is not None:
            k1, k2 = jax.random.split(rng)
            if gaussian_noise > 0:
                cloud = jnp.clip(
                    cloud + gaussian_noise * jax.random.normal(k1, cloud.shape), 0.0, 1.0
                )
            if dropout_prob > 0:
                drop = jax.random.uniform(k2, cloud.shape) < dropout_prob
                cloud = jnp.where(drop, 0.0, cloud)
        parts.append(cloud)
    return jnp.concatenate(parts, axis=-1)
