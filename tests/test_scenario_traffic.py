"""TrajectoryIDM reactive traffic + ScenarioMap lane network.

Mirrors the reference's reactive-traffic behavior tests
(tests/test_policy/test_trajectory_idm_policy.py): a reactive NPC follows
its recorded route and brakes for a body parked on its path; arrives cars
despawn within 2 m of the route end (idm_policy.py:426-455); speed control
refreshes on staggered act batches (scenario_traffic_manager.py:27,75).
Lane-network cases cover ScenarioLane membership from map_features
(component/map/scenario_map.py:9).
"""
import numpy as np
import pytest

from metadrive_ped_tpu.envs.scenario_env import ScenarioEnv


def _straight_sd(T=100, npc_speed=1.0, npc_start=(-20.0, 0.0), sdc_moves=True,
                 lane_polylines=(), npc_route_len=100.0):
    """Synthetic SD: sdc going +x from the origin; one vehicle track starting
    behind it driving +x (eligible for TrajectoryIDM: route > 5 m, behind
    the sdc, aligned heading)."""
    t = np.arange(T, dtype=np.float32)
    sdc_xy = np.stack([t * (0.5 if sdc_moves else 0.0), np.zeros(T)], axis=1)
    step = npc_route_len / (T - 1)
    npc_xy = np.stack(
        [npc_start[0] + t * min(npc_speed, step) * 1.0, np.full(T, npc_start[1])], axis=1
    )
    # constant-speed straight recording: npc_speed m per 0.1 s frame
    npc_xy[:, 0] = npc_start[0] + np.minimum(t * npc_speed, npc_route_len)

    def track(xy, typ, length, width):
        return {
            "type": typ,
            "state": {
                "position": xy.astype(np.float32),
                "heading": np.zeros(T, np.float32),
                "valid": np.ones(T, bool),
                "length": np.full(T, length, np.float32),
                "width": np.full(T, width, np.float32),
            },
            "metadata": {"type": typ, "object_id": "x", "track_length": T},
        }

    map_features = {}
    for i, line in enumerate(lane_polylines):
        map_features[f"lane_{i}"] = {
            "type": "LANE_SURFACE_STREET",
            "polyline": np.asarray(line, np.float32),
        }
    return {
        "id": "synthetic",
        "version": "MetaDrive v0.4.2.3",
        "length": T,
        "tracks": {
            "sdc": track(sdc_xy, "VEHICLE", 4.5, 1.8),
            "npc0": track(npc_xy, "VEHICLE", 4.5, 1.8),
        },
        "dynamic_map_states": {},
        "map_features": map_features,
        "metadata": {
            "coordinate": "metadrive", "ts": np.arange(T, dtype=np.float32) * 0.1,
            "metadrive_processed": True, "sdc_id": "sdc",
            "dataset": "synthetic", "scenario_id": "synthetic", "source_file": "",
        },
    }


def test_reactive_npc_brakes_for_parked_ego():
    """The reference's TrajectoryIDM test: a car parked on the route makes
    the reactive NPC brake to a stop at the IDM desired gap instead of
    driving through it (idm_policy.py:465-477)."""
    sd = _straight_sd(npc_speed=1.0)
    env = ScenarioEnv(dict(
        num_envs=1, scenario_data=[sd], reactive_traffic=True,
        auto_reset=False, sequential_seed=True,
    ))
    env.reset(seed=0)
    crashed = False
    for _ in range(80):
        # ego stays parked at the origin, dead on the NPC's route
        _, _, _, _, info = env.step(np.array([[0.0, 0.0]], np.float32))
        crashed = crashed or bool(np.asarray(info["crash_vehicle"])[0])
    st = env._state
    assert not crashed, "reactive NPC must brake, not rear-end the parked ego"
    # the NPC made progress from its spawn...
    long = float(np.asarray(st.npc_long)[0, 0])
    assert long > 5.0
    # ...but holds an IDM gap behind the ego (center-to-center ~DISTANCE_WANTED)
    npc_x = -20.0 + long
    assert npc_x < -3.0, f"NPC should stop short of the ego, got x={npc_x:.1f}"
    assert float(np.asarray(st.npc_speed)[0, 0]) < 1.0


def test_reactive_npc_free_road_reaches_destination_and_despawns():
    """arrive_destination: within DEST_REGION_RADIUS=2 m of the route end the
    car is cleaned (idm_policy.py:449-455; manager before_step)."""
    sd = _straight_sd(T=60, npc_speed=1.0, npc_start=(-40.0, 8.0),
                      npc_route_len=30.0)
    env = ScenarioEnv(dict(
        num_envs=1, scenario_data=[sd], reactive_traffic=True,
        auto_reset=False, sequential_seed=True, horizon=10_000,
    ))
    env.reset(seed=0)
    dead_seen = False
    for _ in range(120):
        env.step(np.array([[0.0, 0.0]], np.float32))
        if bool(np.asarray(env._state.npc_dead)[0, 0]):
            dead_seen = True
            break
    assert dead_seen, "free-road reactive NPC should arrive and despawn"
    # despawned = inactive for lidar/contacts
    _, _, active = env._npc_pose(env._state)
    assert not bool(np.asarray(active)[0, 0])


def test_staggered_act_batches_commit_every_5_steps():
    """Track k refreshes its IDM acceleration only when
    step % IDM_ACT_BATCH_SIZE == k % IDM_ACT_BATCH_SIZE
    (scenario_traffic_manager.py:75)."""
    sd = _straight_sd(npc_speed=1.0)
    env = ScenarioEnv(dict(
        num_envs=1, scenario_data=[sd], reactive_traffic=True,
        auto_reset=False, sequential_seed=True,
    ))
    env.reset(seed=0)
    accs = []
    for _ in range(11):
        env.step(np.array([[0.0, 0.5]], np.float32))
        accs.append(float(np.asarray(env._state.npc_acc)[0, 0]))
    # track 0's batch step is step_count % 5 == 0, i.e. calls 1, 6, 11;
    # in between the committed acceleration must not change
    assert accs[0] == accs[1] == accs[2] == accs[3] == accs[4]
    assert accs[5] == accs[6] == accs[7] == accs[8] == accs[9]
    # the IDM state changed across batches (speed moved toward target)
    assert accs[0] != accs[5] or accs[5] != accs[10]


def test_late_spawn_holds_until_first_valid_step_with_recorded_speed():
    """A reactive car whose track becomes valid at t=20 must not pre-roll:
    it waits at arc 0, then departs at its RECORDED spawn speed (the
    reference creates the IDM vehicle at its logged state at first_t,
    scenario_traffic_manager.py spawn path)."""
    sd = _straight_sd(npc_speed=1.0)  # 10 m/s recorded
    sd["tracks"]["npc0"]["state"]["valid"][:20] = False
    env = ScenarioEnv(dict(
        num_envs=1, scenario_data=[sd], reactive_traffic=True,
        auto_reset=False, sequential_seed=True,
    ))
    env.reset(seed=0)
    assert float(np.asarray(env.scene.trk_spawn_speed)[0, 0]) > 5.0
    for _ in range(10):
        env.step(np.array([[0.0, 0.5]], np.float32))
    st = env._state
    assert float(np.asarray(st.npc_long)[0, 0]) == 0.0, "must not move pre-spawn"
    # inactive for lidar/contacts until first_t
    assert not bool(np.asarray(env._npc_pose(st)[2])[0, 0])
    for _ in range(20):
        env.step(np.array([[0.0, 0.5]], np.float32))
    st = env._state
    assert float(np.asarray(st.npc_long)[0, 0]) > 5.0, "moves after spawn"
    assert float(np.asarray(st.npc_speed)[0, 0]) > 5.0, "carries recorded speed"


def _arc_lane(radius=30.0, n=40):
    th = np.linspace(-np.pi / 2, 0.0, n)
    return np.stack(
        [radius * np.cos(th), radius + radius * np.sin(th)], axis=1
    )  # quarter arc from (0,0) heading +x curving left


def test_lane_membership_out_of_road_on_curved_lane():
    """Strict out-of-road comes from map-lane membership: on the curved lane
    -> in bounds; planted far off every lane -> out_of_road (ScenarioMap
    lanes, scenario_map.py:9; VERDICT r1 item 4)."""
    arc = _arc_lane()
    sd = _straight_sd(lane_polylines=[arc])
    # sdc trajectory along the arc so the spawn sits on the lane
    T = sd["length"]
    t = np.linspace(0, 1, T).astype(np.float32)
    th = -np.pi / 2 + t * (np.pi / 2) * 0.8
    sd["tracks"]["sdc"]["state"]["position"] = np.stack(
        [30 * np.cos(th), 30 + 30 * np.sin(th)], axis=1
    ).astype(np.float32)
    sd["tracks"]["sdc"]["state"]["heading"] = (th + np.pi / 2).astype(np.float32)
    env = ScenarioEnv(dict(
        num_envs=1, scenario_data=[sd], auto_reset=False, sequential_seed=True,
        relax_out_of_road_done=False, no_traffic=False,
    ))
    assert env._has_lanes
    env.reset(seed=0)
    _, _, _, _, info = env.step(np.array([[0.0, 0.1]], np.float32))
    assert not bool(np.asarray(info["out_of_road"])[0]), \
        "spawn on the curved lane must be in-bounds"
    # plant the ego 25 m off every lane
    st = env._state
    env._state = st.replace(ego=st.ego.replace(pos=st.ego.pos + 25.0))
    _, _, _, _, info = env.step(np.array([[0.0, 0.0]], np.float32))
    assert bool(np.asarray(info["out_of_road"])[0]), \
        "leaving every map lane must be out_of_road in strict mode"


def test_lane_localization_can_be_disabled():
    arc = _arc_lane()
    sd = _straight_sd(lane_polylines=[arc])
    env = ScenarioEnv(dict(
        num_envs=1, scenario_data=[sd], auto_reset=False, sequential_seed=True,
        relax_out_of_road_done=False, need_lane_localization=False,
    ))
    env.reset(seed=0)
    # far from the lane but on no line segments: strict mode without lane
    # localization only checks line/sidewalk contacts
    st = env._state
    env._state = st.replace(ego=st.ego.replace(pos=st.ego.pos + 25.0))
    _, _, _, _, info = env.step(np.array([[0.0, 0.0]], np.float32))
    assert not bool(np.asarray(info["out_of_road"])[0])
