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

- overtake lane changes: the reference's speed-motivated change with
  left-priority and front/back safety margins (lane_change_policy,
  idm_policy.py:330-402), driven by a staggered overtake timer.
- respawn mode recycles arrived NPCs back onto their spawn slot when clear
  (traffic_manager.py:94-122).
Front/back gap search projects every other vehicle onto the candidate lane
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
LANE_CHANGE_FREQ = 50            # idm_policy.py:208
LANE_CHANGE_SPEED_INCREASE = 10  # km/h
SAFE_LANE_CHANGE_DISTANCE = 15.0
MAX_SPEED = 100.0                # km/h, free-lane optimistic speed
CREEP_SPEED = 5.0                # km/h (idm_policy.py:218)
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


def idm_acceleration(speed_kmh, front_speed_kmh, front_dist, has_front,
                     target_speed_kmh=NORMAL_SPEED):
    """IDM longitudinal model (idm_policy.py:303-325), km/h units as-is.
    target_speed drops to CREEP_SPEED while waiting for a forced lane
    change (idm_policy.py:354,367)."""
    v0 = target_speed_kmh
    acc = ACC_FACTOR * (1.0 - jnp.power(jnp.maximum(speed_kmh, 0.0) / v0, DELTA))
    ab = -ACC_FACTOR * DEACC_FACTOR
    dv = speed_kmh - front_speed_kmh
    d_star = DISTANCE_WANTED + speed_kmh * TIME_WANTED + speed_kmh * dv / (2 * jnp.sqrt(ab))
    d = jnp.maximum(front_dist, 1e-2)
    acc = acc - jnp.where(has_front, ACC_FACTOR * (d_star / d) ** 2, 0.0)
    return acc


def _lane_gaps(g, exists, npc_pos,
               cand_pos, cand_speed, cand_active, not_self):
    """Front/back gap search projected on pre-gathered lanes ``g`` [E,N]
    (FrontBackObjects, idm_policy.py:10-174); ``exists`` [E,N] masks rows
    whose lane id was < 0. Returns (front_gap, front_speed, back_gap).

    Distances are CENTER-to-center longitudinal deltas, the reference's
    convention (idm_policy.py:110-118: ``lane.local_coordinates(obj
    .position)[0] - current_long`` with no body-length subtraction) —
    pinned decision-for-decision by tools/ref_idm_oracle.py."""
    long_self, _ = lane_geom.local_coordinates(g, npc_pos)
    g_b = {k: (v[:, :, None] if v.ndim == 2 else v[:, :, None, :]) for k, v in g.items()}
    long_c, lat_c = lane_geom.local_coordinates(g_b, cand_pos[:, None, :, :])  # [E,N,C]
    on_lane = jnp.abs(lat_c) < (g["width"][:, :, None] / 2)
    base_valid = on_lane & cand_active[:, None, :] & not_self & exists[:, :, None]

    ahead = long_c > long_self[:, :, None]
    fgap = long_c - long_self[:, :, None]
    fgap = jnp.where(base_valid & ahead & (fgap < MAX_LONG_DIST), fgap, jnp.inf)
    # plain min-reduce + where-select instead of argmin/take_along_axis —
    # TPU lowers the latter to serialized iota-reduce + scalar gathers,
    # which profiling showed dominating the whole step
    front_gap = fgap.min(axis=2)
    is_front = (fgap == front_gap[..., None]) & jnp.isfinite(fgap)
    front_speed = jnp.max(
        jnp.where(is_front, cand_speed[:, None, :], -jnp.inf), axis=2
    )
    front_speed = jnp.where(jnp.isfinite(front_speed), front_speed, 0.0)

    bgap = long_self[:, :, None] - long_c
    bgap = jnp.where(base_valid & ~ahead & (bgap < MAX_LONG_DIST), bgap, jnp.inf)
    back_gap = bgap.min(axis=2)
    return front_gap, front_speed, back_gap


def lane_change_decision(v_kmh, front_gap, front_speed, overtake_timer,
                         succ_exists, l_exists, r_exists, l_cont, r_cont,
                         l_front, l_front_speed, l_back,
                         r_front, r_front_speed, r_back):
    """The reference's lane_change_policy decision tree
    (idm_policy.py:330-402) as a pure batched function; all distances are
    center-to-center longitudinal deltas (inf = no object within
    MAX_LONG_DIST), speeds in m/s, pinned against the reference-executed
    golden (tools/ref_idm_oracle.py -> tests/goldens/ref_idm.json).

    Returns (go_left, go_right, creep, acc_gap, acc_front_speed,
    overtake_timer') — acc_gap/speed are the (front object, distance) pair
    the acceleration model must react to after the decision.
    """
    has_front = jnp.isfinite(front_gap)
    front_kmh = front_speed * 3.6

    # --- forced lane change on lane drop (idm_policy.py:339-374) ----------
    # the reference detects the drop from navigation's next_ref_lanes
    # count; here a lane with no successor while a neighbor continues is
    # the same event. Unsafe target side => creep at CREEP_SPEED.
    must_change = ~succ_exists & (l_cont | r_cont)
    want_left = must_change & l_cont
    want_right = must_change & ~l_cont & r_cont
    # forced-change margins (idm_policy.py:351-366: creep when
    # back < SAFE_LANE_CHANGE_DISTANCE or front < 5)
    l_clear = (l_back >= SAFE_LANE_CHANGE_DISTANCE) & (l_front >= 5.0)
    r_clear = (r_back >= SAFE_LANE_CHANGE_DISTANCE) & (r_front >= 5.0)
    forced_left = want_left & l_clear
    forced_right = want_right & r_clear
    creep = (want_left & ~l_clear) | (want_right & ~r_clear)

    # --- overtake lane change (idm_policy.py:377-397) ---------------------
    deviate = (
        (jnp.abs(v_kmh - NORMAL_SPEED) > 3.0)
        & has_front & (jnp.abs(front_kmh - NORMAL_SPEED) > 3.0)
        & (overtake_timer > LANE_CHANGE_FREQ)
        & ~must_change
    )
    # never overtake onto an ending lane while the current one continues
    # (available_routing_index_range, idm_policy.py:336-348)
    l_route_ok = l_cont | ~succ_exists
    r_route_ok = r_cont | ~succ_exists
    # the reference's side-speed term (idm_policy.py:380-384): an EXISTING
    # side-front object contributes its speed with NO distance safety
    # check (quirk preserved); only the no-object MAX_SPEED term requires
    # front/back > SAFE_LANE_CHANGE_DISTANCE
    l_has_front = jnp.isfinite(l_front)
    r_has_front = jnp.isfinite(r_front)
    l_open = l_exists & (l_front > SAFE_LANE_CHANGE_DISTANCE) & (l_back > SAFE_LANE_CHANGE_DISTANCE)
    r_open = r_exists & (r_front > SAFE_LANE_CHANGE_DISTANCE) & (r_back > SAFE_LANE_CHANGE_DISTANCE)
    l_kmh = jnp.where(l_has_front, l_front_speed * 3.6,
                      jnp.where(l_open, MAX_SPEED, -jnp.inf))
    r_kmh = jnp.where(r_has_front, r_front_speed * 3.6,
                      jnp.where(r_open, MAX_SPEED, -jnp.inf))
    go_left = forced_left | (
        deviate & l_exists & l_route_ok & (l_kmh - front_kmh > LANE_CHANGE_SPEED_INCREASE)
    )
    go_right = forced_right | (
        deviate & ~go_left & r_exists & r_route_ok
        & (r_kmh - front_kmh > LANE_CHANGE_SPEED_INCREASE)
    )
    go_right = go_right & ~go_left
    changed = go_left | go_right
    overtake_timer = jnp.where(changed, 0, overtake_timer + 1)
    acc_gap = jnp.where(go_left, l_front, jnp.where(go_right, r_front, front_gap))
    acc_front_speed = jnp.where(go_left, l_front_speed,
                                jnp.where(go_right, r_front_speed, front_speed))
    return go_left, go_right, creep, acc_gap, acc_front_speed, overtake_timer


def step_npcs(scene, sidx, npc, ego, dt=0.02, substeps=5, respawn_mode=False,
              expert_actions=None, expert_mask=None, light_block=None,
              extra_bodies=None):
    """One env-step of all NPCs: IDM + lane change + dynamics + routing.

    expert_actions/[E,N,2] + expert_mask/[E,N]: MixedPGTrafficManager — the
    masked slots drive with ExpertPolicy actions instead of IDM
    (traffic_manager.py:403-409; assembled by ops/mixed_traffic.py).

    light_block = (light_lane [E,LG], light_long [E,LG], stop [E,LG]): red
    traffic lights act as a stationary front body at the stop line of their
    lane (the reference's light is a physical air wall across the lane,
    base_traffic_light.py:45-51), so IDM traffic queues at red.

    ego may be None (MARL steps traffic once per ENV, not per agent row);
    extra_bodies = (pos [E,X,2], speed [E,X], length [E,X], active [E,X])
    adds further vehicles the NPCs must react to (all MARL agents)."""
    E, N = npc.lane.shape
    pos_l, speed_l, act_l = [npc.pos], [npc.speed], [npc.active]
    if ego is not None:
        pos_l.append(ego.pos[:, None, :])
        speed_l.append(ego.speed[:, None])
        act_l.append(jnp.ones((E, 1), bool))
    if extra_bodies is not None:
        # (pos, speed, length, active) — length was consumed by the old
        # bumper-gap convention; distances are center-to-center now
        x_pos, x_speed, _x_len, x_act = extra_bodies
        pos_l.append(x_pos)
        speed_l.append(x_speed)
        act_l.append(x_act)
    cand_pos = jnp.concatenate(pos_l, axis=1)                               # [E,C,2]
    cand_speed = jnp.concatenate(speed_l, axis=1)
    cand_active = jnp.concatenate(act_l, axis=1)
    C = cand_pos.shape[1]
    not_self = ~jnp.eye(N, C, dtype=bool)[None]

    # one prejoined lookup yields the NPC's own lane row AND its left/right
    # neighbors' gap-search geometry + successor ids (lane_nbr_table) —
    # replacing five separate one-hot contractions per step
    g, gL, gR = lane_geom.gather_lane_with_neighbors(
        scene, sidx[:, None], npc.lane
    )
    gaps = lambda geom, exists: _lane_gaps(
        geom, exists, npc.pos,
        cand_pos, cand_speed, cand_active, not_self,
    )
    l_exists = g["left"] >= 0
    r_exists = g["right"] >= 0
    front_gap, front_speed, _ = gaps(g, npc.lane >= 0)
    l_front, l_front_speed, l_back = gaps(gL, l_exists)
    r_front, r_front_speed, r_back = gaps(gR, r_exists)

    v_kmh = npc.speed * 3.6
    l_cont = l_exists & (gL["succ"] >= 0)
    r_cont = r_exists & (gR["succ"] >= 0)
    (go_left, go_right, creep, acc_gap, acc_front_speed,
     overtake_timer) = lane_change_decision(
        v_kmh, front_gap, front_speed, npc.overtake_timer,
        succ_exists=g["succ"] >= 0,
        l_exists=l_exists, r_exists=r_exists, l_cont=l_cont, r_cont=r_cont,
        l_front=l_front, l_front_speed=l_front_speed, l_back=l_back,
        r_front=r_front, r_front_speed=r_front_speed, r_back=r_back,
    )
    if expert_mask is not None:
        # expert-driven NPCs steer with the expert policy — IDM lane-change
        # decisions must not move their lane bookkeeping (their lane tracks
        # the BODY, see the lateral reassignment below)
        go_left = go_left & ~expert_mask
        go_right = go_right & ~expert_mask
    target = jnp.where(go_left, g["left"], jnp.where(go_right, g["right"], npc.lane))
    acc_has_front = jnp.isfinite(acc_gap)

    gt = lane_geom.gather_lane(scene, sidx[:, None], target)
    t_long, t_lat = lane_geom.local_coordinates(gt, npc.pos)

    if light_block is not None:
        # a red light on my target lane ahead = a parked body at the stop
        # line: fold it into the front gap so IDM brakes and queues
        l_lane, l_long, l_stop = light_block
        same = (l_lane[:, None, :] == target[:, :, None]) & l_stop[:, None, :]
        dist_stop = l_long[:, None, :] - t_long[..., None]            # [E,N,LG]
        dist_stop = jnp.where(same & (dist_stop > 0), dist_stop, jnp.inf)
        light_gap = dist_stop.min(axis=2) - npc.params.length / 2
        closer = light_gap < jnp.where(acc_has_front, acc_gap, jnp.inf)
        acc_gap = jnp.where(closer, light_gap, acc_gap)
        acc_front_speed = jnp.where(closer, 0.0, acc_front_speed)
        acc_has_front = acc_has_front | jnp.isfinite(light_gap)

    acc = idm_acceleration(
        v_kmh, acc_front_speed * 3.6, jnp.where(acc_has_front, acc_gap, 1e6), acc_has_front,
        target_speed_kmh=jnp.where(creep, CREEP_SPEED, NORMAL_SPEED),
    )

    # --- steering PID toward the (possibly new) target lane ----------------
    lane_heading = lane_geom.heading_theta_at(gt, t_long + 1.0)
    herr = -wrap_to_pi(lane_heading - npc.heading)
    steer_h, h_i, h_e = _pid(HEADING_PID, herr, npc.heading_pid_i, npc.heading_pid_e)
    steer_l, l_i, l_e = _pid(LATERAL_PID, -t_lat, npc.lateral_pid_i, npc.lateral_pid_e)
    steering = steer_h + steer_l

    moving = npc.active & npc.released
    steering = jnp.clip(jnp.where(moving, steering, 0.0), -1.0, 1.0)
    throttle = jnp.clip(jnp.where(moving, acc, 0.0), -1.0, 1.0)
    if expert_actions is not None and expert_mask is not None:
        use_exp = expert_mask & moving
        steering = jnp.where(use_exp, expert_actions[..., 0], steering)
        throttle = jnp.where(use_exp, expert_actions[..., 1], throttle)

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
    g2 = gt  # same lookup as the steering target — reuse, don't re-contract
    long2, lat2 = lane_geom.local_coordinates(g2, pos)
    passed = long2 > g2["length"]
    succ = g2["succ"]
    new_lane = jnp.where(passed & (succ >= 0), succ, target)
    at_end = passed & (succ < 0) & moving
    if expert_mask is not None:
        # expert NPCs change lanes on their own: track the body by lateral
        # offset (positive lateral = right of the lane centerline), like the
        # reference's per-step ray localization of every vehicle
        drift_r = (lat2 > gt["width"] / 2) & (g["right"] >= 0)
        drift_l = (lat2 < -gt["width"] / 2) & (g["left"] >= 0)
        reassign = jnp.where(drift_r, g["right"],
                             jnp.where(drift_l, g["left"], target))
        new_lane = jnp.where(expert_mask & ~passed & moving, reassign, new_lane)

    if respawn_mode:
        # Respawn at the original spawn slot when it is clear
        # (traffic_manager.py:94-122 _create_respawn_vehicles recycling);
        # spawn poses are static per scenario — host-precomputed row gathers
        # instead of an in-kernel lane lookup (core/structs.py)
        spawn_lane = scene.npc_lane[sidx]
        spawn_pos = scene.npc_spawn_pos[sidx]
        d2 = ((spawn_pos[:, :, None, :] - cand_pos[:, None, :, :]) ** 2).sum(-1)
        clear = (jnp.where(cand_active[:, None, :], d2, jnp.inf).min(axis=2) > 8.0 ** 2)
        do = at_end & clear
        keep_dead = at_end & ~clear
        pos = jnp.where(do[..., None], spawn_pos, pos)
        heading = jnp.where(do, scene.npc_spawn_heading[sidx], heading)
        speed = jnp.where(do, 0.0, speed)
        vel_dir = jnp.where(do, 0.0, vel_dir)
        new_lane = jnp.where(do, spawn_lane, new_lane)
        active = npc.active & ~keep_dead
        overtake_timer = jnp.where(do, 0, overtake_timer)
    else:
        active = npc.active & ~at_end

    return npc.replace(
        pos=pos, heading=heading, speed=speed, vel_dir=vel_dir,
        lane=new_lane, active=active, overtake_timer=overtake_timer,
        heading_pid_i=jnp.where(moving, h_i, npc.heading_pid_i),
        heading_pid_e=jnp.where(moving, h_e, npc.heading_pid_e),
        lateral_pid_i=jnp.where(moving, l_i, npc.lateral_pid_i),
        lateral_pid_e=jnp.where(moving, l_e, npc.lateral_pid_e),
    )
