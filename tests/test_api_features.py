"""Discrete actions, gym wrapper, varying dynamics, snapshots, episode export
(reference: policy/env_input_policy.py, envs/gym_wrapper.py,
envs/varying_dynamics_env.py, manager/record_manager.py + export flow)."""
import numpy as np

from metadrive_ped_tpu import MetaDriveEnv, VaryingDynamicsEnv, createGymWrapper
from metadrive_ped_tpu.scenario import ScenarioDescription, export_scenarios


def test_discrete_action_space_and_mapping():
    env = MetaDriveEnv(
        dict(num_envs=4, map="S", num_scenarios=1, traffic_density=0.0,
             discrete_action=True)
    )
    import gymnasium as gym
    assert isinstance(env.action_space, gym.spaces.Discrete)
    assert env.action_space.n == 25
    env.reset(seed=0)
    # action 22 = (22 % 5, 22 // 5) = (2, 4) -> steering 0, throttle +1
    obs, r, te, tr, info = env.step(np.full(4, 22))
    np.testing.assert_allclose(np.asarray(info["steering"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(info["acceleration"]), 1.0, atol=1e-6)


def test_multi_discrete_action():
    env = MetaDriveEnv(
        dict(num_envs=2, map="S", num_scenarios=1, traffic_density=0.0,
             discrete_action=True, use_multi_discrete=True)
    )
    import gymnasium as gym
    assert isinstance(env.action_space, gym.spaces.MultiDiscrete)
    env.reset(seed=0)
    obs, r, te, tr, info = env.step(np.tile([0, 4], (2, 1)))  # full left, full throttle
    np.testing.assert_allclose(np.asarray(info["steering"]), -1.0, atol=1e-6)


def test_gym_wrapper_legacy_api():
    GymEnv = createGymWrapper(MetaDriveEnv)
    env = GymEnv(dict(num_envs=2, map="S", num_scenarios=1, traffic_density=0.0))
    obs = env.reset(seed=0)
    assert obs.shape == (2, 259)
    out = env.step(np.tile([0.0, 0.5], (2, 1)))
    assert len(out) == 4  # obs, reward, done, info
    env.close()


def test_varying_dynamics_differ_across_envs():
    env = VaryingDynamicsEnv(dict(num_envs=8, map="S", num_scenarios=4, traffic_density=0.0))
    env.reset(seed=0)
    gains = np.asarray(env._state.ego.params.accel_gain)
    assert len(np.unique(np.round(gains, 4))) > 1, "dynamics should differ across envs"


def test_snapshot_restore_roundtrip():
    env = MetaDriveEnv(dict(num_envs=2, map="S", num_scenarios=1, traffic_density=0.1))
    env.reset(seed=0)
    acts = np.tile([0.0, 1.0], (2, 1)).astype(np.float32)
    for _ in range(10):
        env.step(acts)
    snap = env.snapshot()
    obs_a, r_a, *_ = env.step(acts)
    env.restore(snap)
    obs_b, r_b, *_ = env.step(acts)
    np.testing.assert_array_equal(np.asarray(obs_a), np.asarray(obs_b))
    np.testing.assert_array_equal(np.asarray(r_a), np.asarray(r_b))


def test_export_scenarios_schema():
    env = MetaDriveEnv(dict(num_envs=2, map="S", num_scenarios=1, traffic_density=0.2))
    env.reset(seed=0)
    acts = np.tile([0.0, 0.8], (2, 1)).astype(np.float32)
    scenarios = export_scenarios(env, 25, actions=acts)
    assert set(scenarios.keys()) == {0, 1}
    for sd in scenarios.values():
        ScenarioDescription.sanity_check(sd)
        assert sd[ScenarioDescription.LENGTH] == 25
        sdc = sd[ScenarioDescription.TRACKS]["sdc"]
        pos = sdc[ScenarioDescription.STATE][ScenarioDescription.POSITION]
        assert np.linalg.norm(pos[-1, :2] - pos[0, :2]) > 1.0, "sdc should move"
