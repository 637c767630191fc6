"""Env blackbox tests (mirrors the reference's
tests/test_env/test_metadrive_env.py style: construct, step, assert
obs/reward/termination invariants)."""
import numpy as np
import pytest

from metadrive_ped_tpu import MetaDriveEnv


def make_env(**overrides):
    cfg = dict(num_envs=4, map="S", num_scenarios=1, traffic_density=0.0)
    cfg.update(overrides)
    return MetaDriveEnv(cfg)


@pytest.fixture(scope="module")
def env():
    return make_env()


def test_reset_obs_shape_and_range(env):
    obs, info = env.reset(seed=0)
    assert obs.shape == (4, 259)
    o = np.asarray(obs)
    assert np.isfinite(o).all()
    assert (o >= 0.0).all() and (o <= 1.0).all()


def test_step_moves_forward(env):
    env.reset(seed=0)
    for _ in range(20):
        obs, r, term, trunc, info = env.step(np.tile([0.0, 1.0], (4, 1)))
    st = env._state
    assert float(st.ego.speed[0]) > 3.0
    assert float(np.asarray(r)[0]) > 0.0
    assert not bool(np.asarray(term).any())


def test_hard_steer_leaves_road(env):
    env.reset(seed=0)
    done_seen = False
    for _ in range(100):
        obs, r, term, trunc, info = env.step(np.tile([1.0, 1.0], (4, 1)))
        if bool(np.asarray(term).any()):
            done_seen = True
            assert bool(np.asarray(info["out_of_road"]).any()) or bool(
                np.asarray(info["crash"]).any()
            )
            break
    assert done_seen, "full-lock steering should terminate the episode"
    # negative terminal reward on the done env
    done_mask = np.asarray(term)
    assert (np.asarray(r)[done_mask] < 0).all()


def test_straight_full_throttle_reaches_destination():
    env = make_env(map="S", num_envs=2)
    env.reset(seed=3)
    arrived = False
    for i in range(300):
        obs, r, term, trunc, info = env.step(np.tile([0.0, 1.0], (2, 1)))
        if bool(np.asarray(info["arrive_dest"]).any()):
            arrived = True
            assert (np.asarray(r)[np.asarray(info["arrive_dest"])] == 10.0).all()
            break
    assert arrived, "ego should reach the end of a straight map at full throttle"


def test_auto_reset_restarts_episode(env):
    env.reset(seed=0)
    for _ in range(120):
        obs, r, term, trunc, info = env.step(np.tile([1.0, 1.0], (4, 1)))
        if bool(np.asarray(term).any()):
            break
    # after the done step, state must be back at spawn for done envs
    st = env._state
    done = np.asarray(term)
    assert done.any()
    assert np.allclose(np.asarray(st.ego.speed)[done], 0.0)
    assert (np.asarray(st.step_count)[done] == 0).all()


def test_horizon_truncation():
    env = make_env(horizon=10)
    env.reset(seed=0)
    for i in range(10):
        obs, r, term, trunc, info = env.step(np.tile([0.0, 0.0], (4, 1)))
    assert bool(np.asarray(trunc).all())


def test_traffic_spawns_and_lidar_sees():
    env = make_env(map="SS", traffic_density=0.5, num_envs=2)
    obs, info = env.reset(seed=0)
    st = env._state
    assert bool(np.asarray(st.npc.active).any()), "traffic should spawn at density 0.5"
    # drive forward; lidar channel (last 240 dims) should dip below 1
    seen = False
    for _ in range(60):
        obs, r, term, trunc, info = env.step(np.tile([0.0, 1.0], (2, 1)))
        cloud = np.asarray(obs)[:, 19:]
        if (cloud < 0.99).any():
            seen = True
            break
    assert seen, "lidar should detect NPC vehicles"


def test_multiple_scenarios():
    env = MetaDriveEnv(dict(num_envs=8, map=3, num_scenarios=4, traffic_density=0.0))
    obs, info = env.reset(seed=1)
    seeds = np.asarray(info["env_seed"])
    assert obs.shape == (8, 259)
    assert len(np.unique(seeds)) > 1, "envs should spread over scenarios"


def test_determinism_same_seed():
    env1 = make_env()
    env2 = make_env()
    o1, _ = env1.reset(seed=5)
    o2, _ = env2.reset(seed=5)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    a = np.tile([0.1, 0.8], (4, 1))
    for _ in range(10):
        o1, r1, *_ = env1.step(a)
        o2, r2, *_ = env2.step(a)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_side_and_lane_line_detector_obs():
    """side_detector cloud replaces the 2 border features, lane_line cloud
    the lateral feature; random_agent_model prepends L/W
    (reference obs/state_obs.py:69-151 vehicle_state branches)."""
    env = make_env(
        map=2, num_scenarios=1, traffic_density=0.0, random_agent_model=True,
        vehicle_config=dict(
            side_detector=dict(num_lasers=8, distance=50.0),
            lane_line_detector=dict(num_lasers=6, distance=20.0),
            lidar=dict(num_lasers=24),
        ),
    )
    expected = 2 + 8 + 6 + 6 + 10 + 24
    assert env.observation_dim == expected
    obs, _ = env.reset(seed=0)
    assert obs.shape == (4, expected)
    obs = env.step(np.zeros((4, 2)))[0]
    o = np.asarray(obs)
    assert np.isfinite(o).all() and (o >= 0.0).all() and (o <= 1.0).all()
    # both clouds must register the lane lines around the spawn lane
    assert o[:, 2:10].min() < 1.0          # side detector (continuous lines)
    assert o[:, 16:22].min() < 1.0         # lane-line detector (any line)
    # random_agent_model size features: default class would be
    # 4.515/10, 1.852/2.5; a uniform class draw across 4 envs x 5 classes
    # should not all equal the default
    assert (o[:, 0] > 0).all() and (o[:, 1] > 0).all()


def test_random_agent_model_varies_class():
    env = make_env(num_envs=16, random_agent_model=True)
    env.reset(seed=3)
    lengths = np.asarray(env._state.ego.params.length)
    assert len(np.unique(np.round(lengths, 3))) > 1


@pytest.mark.parametrize("cfg", [
    dict(map=7, traffic_density=0.1),
    dict(map="CCC", num_scenarios=2),
    dict(map=2, vehicle_config=dict(lidar=dict(num_lasers=0))),
    dict(map=2, vehicle_config=dict(lidar=dict(num_lasers=120, num_others=2))),
    dict(map=2, discrete_action=True),
    dict(map=2, use_lateral_reward=True, traffic_density=0.05),
])
def test_env_config_matrix(cfg):
    """Config-matrix blackbox sweep (reference:
    tests/test_env/test_metadrive_env.py's env_config matrix): construct,
    reset, step; obs within space, info keys present."""
    env = make_env(num_envs=2, **cfg)
    obs, info = env.reset(seed=1)
    assert obs.shape == (2, env.observation_dim)
    if cfg.get("discrete_action"):
        act = np.array([7, 12])
    else:
        act = np.zeros((2, 2))
    obs, r, term, trunc, info = env.step(act)
    o = np.asarray(obs)
    assert np.isfinite(o).all() and (o >= 0).all() and (o <= 1).all()
    for key in ("arrive_dest", "crash_vehicle", "out_of_road", "step_reward",
                "velocity", "steering", "acceleration", "cost"):
        assert key in info, key


def test_lidar_cloud_noise_and_dropout():
    """Lidar cloud noise parity (reference tests/test_functionality/
    test_obs_noise.py; _add_noise_to_cloud_points, state_obs.py:234-244):
    gaussian noise perturbs the cloud within [0,1]; dropout zeroes points;
    dropout_prob=1.0 zeroes the whole cloud."""
    import numpy as np
    from metadrive_ped_tpu import MetaDriveEnv

    def cloud(noise, drop):
        env = MetaDriveEnv(dict(
            num_envs=2, map="S", num_scenarios=1, traffic_density=0.5,
            traffic_mode="respawn", auto_reset=False,
            vehicle_config=dict(lidar=dict(gaussian_noise=noise,
                                           dropout_prob=drop)),
        ))
        env.reset(seed=0)
        for _ in range(5):
            obs, *_ = env.step(np.zeros((2, 2), np.float32))
        env.close()
        return np.asarray(obs)[:, 19:]

    clean = cloud(0.0, 0.0)
    noisy = cloud(0.2, 0.0)
    assert not np.allclose(clean, noisy), "gaussian noise must perturb"
    assert noisy.min() >= 0.0 and noisy.max() <= 1.0
    dropped = cloud(0.0, 1.0)
    assert np.allclose(dropped, 0.0), "dropout_prob=1 zeroes the cloud"
