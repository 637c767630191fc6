"""Vectorized IDM traffic policy + NPC advancement.

Replaces the per-NPC Python IDMPolicy loop (policy/idm_policy.py:177-402)
with batched kernels over the NPC slot axis [E, N]:

- route following: an NPC whose longitudinal position passes its target
  lane's end hops to `lane_succ`; with no successor it deactivates
  (reference NPCs despawn at route end, traffic_manager.py:94-122).
- longitudinal control: IDM acceleration with the reference's constants and
  (deliberately reproduced) km/h unit mix (idm_policy.py:303-325).
- lateral control: heading PID + lateral PID onto the target lane
  (idm_policy.py:293-301; PID form PID_controller.py:10-21).

Lane changing (lane_change_policy) is not yet ported — NPCs lane-follow.
Front-gap search is exact on the target lane over all other vehicles
(reference scans lidar-detected neighbors; FrontBackObjects,
idm_policy.py:10-174).
"""
import jax.numpy as jnp

from metadrive_ped_tpu.ops import dynamics, lane_geom
from metadrive_ped_tpu.ops.math_ops import wrap_to_pi

# reference: idm_policy.py:183-221
NORMAL_SPEED = 30.0        # km/h
ACC_FACTOR = 1.0
DEACC_FACTOR = -5.0
DELTA = 10.0
DISTANCE_WANTED = 10.0
TIME_WANTED = 1.5
MAX_LONG_DIST = 30.0
# PID gains (idm_policy.py:233-234)
HEADING_PID = (1.7, 0.01, 3.5)
LATERAL_PID = (0.3, 0.002, 0.05)


def _pid(gains, err, i_state, prev_err):
    """Incremental PID (PID_controller.py:10-21); returns (out, i, prev)."""
    kp, ki, kd = gains
    i_state = i_state + err
    d = err - prev_err
    out = -(kp * err + ki * i_state + kd * d)
    return out, i_state, err


def idm_acceleration(speed_kmh, front_speed_kmh, front_dist, has_front):
    """IDM longitudinal model (idm_policy.py:303-325), km/h units as-is."""
    v0 = NORMAL_SPEED
    acc = ACC_FACTOR * (1.0 - jnp.power(jnp.maximum(speed_kmh, 0.0) / v0, DELTA))
    ab = -ACC_FACTOR * DEACC_FACTOR
    dv = speed_kmh - front_speed_kmh
    d_star = DISTANCE_WANTED + speed_kmh * TIME_WANTED + speed_kmh * dv / (2 * jnp.sqrt(ab))
    d = jnp.maximum(front_dist, 1e-2)
    acc = acc - jnp.where(has_front, ACC_FACTOR * (d_star / d) ** 2, 0.0)
    return acc


def step_npcs(scene, sidx, npc, ego, dt=0.02, substeps=5):
    """One env-step of all NPCs: policy + dynamics + route bookkeeping."""
    E, N = npc.lane.shape
    g = lane_geom.gather_lane(scene, sidx[:, None], npc.lane)
    long_self, lat_self = lane_geom.local_coordinates(g, npc.pos)

    # --- front-gap search on the target lane over NPCs + ego --------------
    # positions of all candidate vehicles projected onto EACH npc's lane:
    # candidates = all npcs [E,1,N,2] + ego [E,1,1,2] vs lanes [E,N]
    cand_pos = jnp.concatenate([npc.pos, ego.pos[:, None, :]], axis=1)      # [E,N+1,2]
    cand_speed = jnp.concatenate([npc.speed, ego.speed[:, None]], axis=1)   # [E,N+1]
    cand_len = jnp.concatenate([npc.params.length, ego.params.length[:, None]], axis=1)
    cand_active = jnp.concatenate([npc.active, jnp.ones((E, 1), bool)], axis=1)

    g_b = {k: v[:, :, None] if v.ndim == 2 else v[:, :, None, :] for k, v in g.items()}
    long_c, lat_c = lane_geom.local_coordinates(g_b, cand_pos[:, None, :, :])  # [E,N,N+1]
    on_my_lane = jnp.abs(lat_c) < (g["width"][:, :, None] / 2)
    ahead = long_c > long_self[:, :, None]
    not_self = ~jnp.eye(N, N + 1, dtype=bool)[None]
    valid = on_my_lane & ahead & cand_active[:, None, :] & not_self
    gap = long_c - long_self[:, :, None] - (cand_len[:, None, :] + npc.params.length[:, :, None]) / 2
    gap = jnp.where(valid & (gap < MAX_LONG_DIST), gap, jnp.inf)
    front_idx = jnp.argmin(gap, axis=2)
    front_dist = jnp.take_along_axis(gap, front_idx[..., None], axis=2)[..., 0]
    has_front = jnp.isfinite(front_dist)
    front_speed = jnp.take_along_axis(cand_speed[:, None, :], front_idx[..., None], axis=2)[..., 0]

    acc = idm_acceleration(
        npc.speed * 3.6, front_speed * 3.6, jnp.where(has_front, front_dist, 1e6), has_front
    )

    # --- steering PID (idm_policy.py:293-301) -----------------------------
    lane_heading = lane_geom.heading_theta_at(g, long_self + 1.0)
    herr = -wrap_to_pi(lane_heading - npc.heading)
    steer_h, h_i, h_e = _pid(HEADING_PID, herr, npc.heading_pid_i, npc.heading_pid_e)
    steer_l, l_i, l_e = _pid(LATERAL_PID, -lat_self, npc.lateral_pid_i, npc.lateral_pid_e)
    steering = steer_h + steer_l

    moving = npc.active & npc.released
    steering = jnp.clip(jnp.where(moving, steering, 0.0), -1.0, 1.0)
    throttle = jnp.clip(jnp.where(moving, acc, 0.0), -1.0, 1.0)

    pos, heading, speed, vel_dir = dynamics.step_vehicle(
        npc.pos, npc.heading, npc.speed, npc.vel_dir, steering, throttle,
        npc.params, dt=dt, substeps=substeps, enable_reverse=False,
    )
    # frozen NPCs keep their state exactly
    keep = lambda new, old: jnp.where(
        moving.reshape(moving.shape + (1,) * (old.ndim - moving.ndim)), new, old
    )
    pos = keep(pos, npc.pos)
    heading = keep(heading, npc.heading)
    speed = keep(speed, npc.speed)
    vel_dir = keep(vel_dir, npc.vel_dir)

    # --- route advance / arrival (traffic_manager.py:94-122) --------------
    # (lane params unchanged within the step: reuse g for the moved position)
    long2, _ = lane_geom.local_coordinates(g, pos)
    passed = long2 > g["length"]
    succ = g["succ"]
    new_lane = jnp.where(passed & (succ >= 0), succ, npc.lane)
    deactivate = passed & (succ < 0) & moving
    active = npc.active & ~deactivate

    return npc.replace(
        pos=pos, heading=heading, speed=speed, vel_dir=vel_dir,
        lane=new_lane, active=active,
        heading_pid_i=jnp.where(moving, h_i, npc.heading_pid_i),
        heading_pid_e=jnp.where(moving, h_e, npc.heading_pid_e),
        lateral_pid_i=jnp.where(moving, l_i, npc.lateral_pid_i),
        lateral_pid_e=jnp.where(moving, l_e, npc.lateral_pid_e),
    )
