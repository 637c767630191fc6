"""Agent policies (reference: policy/lange_change_policy.py,
AI_protect_policy.py, manual_control_policy.py)."""
import numpy as np
import pytest

from metadrive_ped_tpu import MetaDriveEnv


def _lane_idx(env):
    lane = np.asarray(env._state.ego.lane)
    return env._pack["lane_idx_in_road"][np.asarray(env._state.sidx), lane]


def test_lane_change_policy():
    env = MetaDriveEnv(dict(
        num_envs=2, map="SS", num_scenarios=1, traffic_density=0.0,
        agent_policy="lane_change", discrete_action=True, use_multi_discrete=True,
    ))
    import gymnasium as gym
    assert isinstance(env.action_space, gym.spaces.MultiDiscrete)
    assert list(env.action_space.nvec) == [3, 5]
    env.reset(seed=0)
    assert (_lane_idx(env) == 0).all()
    for _ in range(30):
        env.step(np.tile([1, 3], (2, 1)))   # keep lane
    assert (_lane_idx(env) == 0).all(), "keep command must hold the lane"
    for _ in range(40):
        env.step(np.tile([0, 3], (2, 1)))   # steer idx 0 -> -1 = right
    assert (_lane_idx(env) > 0).all(), "right command must change lanes right"
    for _ in range(40):
        env.step(np.tile([2, 3], (2, 1)))   # steer idx 2 -> +1 = left
    assert (_lane_idx(env) == 0).all(), "left command must return to lane 0"


def test_lane_change_requires_discrete():
    with pytest.raises(AssertionError):
        MetaDriveEnv(dict(num_envs=1, agent_policy="lane_change"))


EXPERT_VC = dict(lidar=dict(num_lasers=240, distance=50.0, num_others=4,
                            gaussian_noise=0.0, dropout_prob=0.0))


def test_ai_protector_saves_from_suicide():
    """save_level > 0.9: the expert drives instead of the hard-left action
    (AI_protect_policy.py full-takeover branch)."""
    # start_seed=2: a CC geometry the expert can hold (the seed->map pairing
    # shifts whenever map sampling becomes more reference-exact; re-pinned
    # after the init-draw + float32 parameter parity fix)
    env = MetaDriveEnv(dict(num_envs=4, map="CC", num_scenarios=1, start_seed=2,
                            traffic_density=0.0,
                            use_AI_protector=True, save_level=0.95,
                            vehicle_config=EXPERT_VC))
    env.reset(seed=0)
    takeovers = oor = 0
    for _ in range(80):
        obs, r, te, tr, inf = env.step(np.tile([1.0, 1.0], (4, 1)))
        takeovers += int(np.asarray(inf["takeover"]).sum())
        oor += int(np.asarray(inf["out_of_road"]).sum())
    assert takeovers > 100, "protector must take over suicidal steering"
    assert oor == 0, "protected vehicles must stay on the road"
    unprotected = MetaDriveEnv(dict(num_envs=4, map="CC", num_scenarios=1,
                                    start_seed=2,
                                    traffic_density=0.0, vehicle_config=EXPERT_VC))
    unprotected.reset(seed=0)
    oor2 = 0
    for _ in range(80):
        obs, r, te, tr, inf = unprotected.step(np.tile([1.0, 1.0], (4, 1)))
        oor2 += int(np.asarray(inf["out_of_road"]).sum())
    assert oor2 > 0, "the same actions must fail without the protector"


def test_ai_protector_partial_save_level_passes_safe_actions():
    """At low save_level, safe straight driving is not overridden."""
    env = MetaDriveEnv(dict(num_envs=2, map="S", num_scenarios=1, traffic_density=0.0,
                            use_AI_protector=True, save_level=0.5,
                            vehicle_config=EXPERT_VC))
    env.reset(seed=0)
    for _ in range(10):
        obs, r, te, tr, inf = env.step(np.tile([0.0, 0.3], (2, 1)))
    assert not bool(np.asarray(inf["takeover"]).any())


def test_manual_control_scripted():
    """A scripted controller overrides env row 0 (ManualControlPolicy
    tracked-agent routing)."""
    env = MetaDriveEnv(dict(num_envs=2, map="S", num_scenarios=1, traffic_density=0.0,
                            manual_control=True,
                            controller=lambda: np.array([0.0, 1.0], np.float32)))
    env.reset(seed=0)
    for _ in range(10):
        env.step(np.zeros((2, 2), np.float32))
    speeds = np.asarray(env._state.ego.speed)
    assert speeds[0] > 1.0, "manual full throttle must drive row 0"
    assert speeds[1] < 0.2, "row 1 keeps the zero policy action"


def test_ai_protector_decision_tree_matches_reference():
    """Decision-for-decision pin of the takeover conditions against
    AI_protect_policy.py:22-57: (1) boundary-danger replaces BOTH components
    (+0.5 throttle when nearly stopped), (2) side-lidar danger replaces
    steering only, (3) front-lidar danger replaces throttle only when the
    user accelerates and the saver brakes, (4) clear obs pass through; a
    takeover only *applies* from the second consecutive takeover step."""
    import jax.numpy as jnp
    from metadrive_ped_tpu.policies.expert import expert_action

    n = 240
    env = MetaDriveEnv(dict(
        num_envs=4, map="S", num_scenarios=1, traffic_density=0.0,
        use_AI_protector=True, save_level=0.5,
        vehicle_config=dict(lidar=dict(num_lasers=n, num_others=4)),
    ))
    env.reset(seed=0)
    D = env.observation_dim
    obs = np.full((4, D), 0.5, np.float32)
    obs[:, -n:] = 1.0                      # lidar clear everywhere...
    # row 0: fully clear
    # row 1: on the left boundary (obs[0] <= 1e-3 -> unconditional veto)
    obs[1, 0] = 0.0005
    # row 2: side collision threat (lasers around n/4)
    left = n // 4
    obs[2, -n + left] = 0.01
    # row 3: frontal collision threat (first lasers)
    obs[3, -n] = 0.01

    user = np.tile([0.3, 0.7], (4, 1)).astype(np.float32)
    state = env._state
    saver = np.asarray(expert_action(env._expert_params, jnp.asarray(obs)))

    # first call: takeover latches but is NOT applied (pre_save gate,
    # AI_protect_policy.py:52-57)
    state1, a1, info1 = env._ai_protect(state, jnp.asarray(user), jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(a1), user, atol=1e-6)
    start = np.asarray(info1["takeover_start"])
    assert not start[0] and start[1] and start[2]

    # second consecutive call applies the saver composition
    state2, a2, info2 = env._ai_protect(state1, jnp.asarray(user), jnp.asarray(obs))
    a2 = np.asarray(a2)
    tk = np.asarray(info2["takeover"])
    # row 0: untouched
    assert not tk[0]
    np.testing.assert_allclose(a2[0], user[0], atol=1e-6)
    # row 1: boundary veto replaces both; ego speed ~0 -> throttle forced 0.5
    assert tk[1]
    np.testing.assert_allclose(a2[1, 0], saver[1, 0], atol=1e-5)
    np.testing.assert_allclose(a2[1, 1], 0.5, atol=1e-5)
    # row 2: steering replaced, throttle untouched
    assert tk[2]
    np.testing.assert_allclose(a2[2, 0], saver[2, 0], atol=1e-5)
    np.testing.assert_allclose(a2[2, 1], user[2, 1], atol=1e-6)
    # row 3: throttle replaced iff user accelerates AND the saver brakes
    if saver[3, 1] <= 0:
        assert tk[3]
        np.testing.assert_allclose(a2[3, 1], saver[3, 1], atol=1e-5)
        np.testing.assert_allclose(a2[3, 0], user[3, 0], atol=1e-6)
    else:
        assert not tk[3]
        np.testing.assert_allclose(a2[3], user[3], atol=1e-6)
