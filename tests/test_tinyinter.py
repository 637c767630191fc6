"""MultiAgentTinyInter: mixed rule-based/RL agents + communication obs
(reference: envs/marl_envs/tinyinter.py:14-415)."""
import numpy as np
import pytest

from metadrive_ped_tpu.envs.marl_envs import MultiAgentTinyInter

VC = dict(lidar=dict(num_lasers=72, distance=40.0, num_others=0))


def test_tinyinter_rl_surface_and_mixed_motion():
    """Only num_RL_agents columns are exposed; rule rows drive themselves
    kinematically at target_speed while zero-action RL rows stay put."""
    env = MultiAgentTinyInter(dict(
        num_envs=2, num_agents=8, num_RL_agents=4, vehicle_config=VC,
    ))
    obs, info = env.reset(seed=0)
    assert obs.shape == (2, 4, env.observation_dim)
    p0 = np.asarray(env._state.ego.pos).reshape(2, 8, 2).copy()
    steps = 30
    for _ in range(steps):
        obs, r, te, tr, inf = env.step(np.zeros((2, 4, 2), np.float32))
    assert obs.shape[1] == 4 and r.shape == (2, 4)
    assert te.shape == (2, 4) and "__all__" in inf
    p1 = np.asarray(env._state.ego.pos).reshape(2, 8, 2)
    moved = np.linalg.norm(p1 - p0, axis=-1)
    # 10 km/h * 0.1 s/step = 0.278 m/step along the lane (turns shorten the
    # straight-line displacement)
    assert (moved[:, 4:] > 0.15 * steps).all(), "rule agents must advance"
    # zero-action RL rows stay put except when a rule car shoves them
    # (contact response) — the median row must be stationary
    assert np.median(moved[:, :4]) < 0.05 * steps, "zero-action RL agents stay"
    assert moved[:, :4].max() < moved[:, 4:].min() + 1.0
    env.close()


def test_tinyinter_rule_agents_visible_in_lidar():
    """Rule-based cars are physical bodies: RL agents' lidar must see them
    (MixedIDMAgentManager spawns them as normal vehicles)."""
    env = MultiAgentTinyInter(dict(
        num_envs=1, num_agents=8, num_RL_agents=2, vehicle_config=VC,
    ))
    obs, _ = env.reset(seed=0)
    saw = False
    for _ in range(40):
        obs, r, te, tr, inf = env.step(np.zeros((1, 2, 2), np.float32))
        lidar = np.asarray(obs)[..., -72:]
        saw = saw or bool((lidar < 0.999).any())
    assert saw, "rule-based traffic must appear in the RL agents' lidar"
    env.close()


def test_tinyinter_communication_obs_layout():
    """CommunicationObservation (tinyinter.py:14-190): obs = state-part +
    A*5 comm block + lidar cloud. The ego's own slot carries its slot id
    and neutral 0.5/0.5 relative position."""
    A, K = 8, 8
    env = MultiAgentTinyInter(dict(
        num_envs=1, num_agents=A, num_RL_agents=K,
        use_communication_obs=True, vehicle_config=VC,
    ))
    obs, _ = env.reset(seed=0)
    base_dim = 91  # 19 state + 72 lasers (num_others=0)
    assert env.observation_dim == base_dim + A * 5
    o = np.asarray(obs)[0]          # [A, D]
    comm = o[:, 19: 19 + A * 5].reshape(A, A, 5)
    for a in range(A):
        # own slot: id (a+1)/A, rel pos exactly centered
        np.testing.assert_allclose(comm[a, a, 0], (a + 1) / A, atol=1e-5)
        np.testing.assert_allclose(comm[a, a, 1:3], 0.5, atol=1e-5)
        # every active slot carries its id
        for j in range(A):
            np.testing.assert_allclose(comm[a, j, 0], (j + 1) / A, atol=1e-5)
    # comm features stay in [0, 1] while stepping
    for _ in range(10):
        obs, *_ = env.step(np.tile([0.0, 0.5], (1, K, 1)))
    c = np.asarray(obs)[0][:, 19: 19 + A * 5]
    assert c.min() >= 0.0 and c.max() <= 1.0
    env.close()


def test_tinyinter_map_is_tiny():
    """map_config parity: 1 lane, 4 m wide, 30 m exits (tinyinter.py:346)."""
    env = MultiAgentTinyInter(dict(num_envs=1, vehicle_config=VC))
    assert env.config["map_config"]["lane_num"] == 1
    assert env.config["map_config"]["lane_width"] == 4.0
    assert env.config["map_config"]["exit_length"] == 30.0
    assert env.config["delay_done"] == 0  # ignore_delay_done
    env.close()


def test_tinyinter_add_others_navi():
    """add_others_navi widens each comm slot to 9 dims with the slot's two
    navi checkpoints projected into the observer's frame
    (tinyinter.py:142-186)."""
    A = 4
    env = MultiAgentTinyInter(dict(
        num_envs=1, num_agents=A, num_RL_agents=A, use_communication_obs=True,
        vehicle_config=dict(lidar=dict(num_lasers=72, distance=40.0,
                                       num_others=0, add_others_navi=True)),
    ))
    obs, _ = env.reset(seed=0)
    assert env.observation_dim == 91 + A * 9
    o = np.asarray(obs)[0]
    comm = o[:, 19: 19 + A * 9].reshape(A, A, 9)
    # checkpoint features live in [0,1] and are not degenerate zeros for
    # active slots
    assert comm[..., 5:].min() >= 0.0 and comm[..., 5:].max() <= 1.0
    assert (comm[..., 5:] > 0.0).any()
    for _ in range(5):
        obs, *_ = env.step(np.tile([0.0, 0.4], (1, A, 1)))
    assert np.isfinite(np.asarray(obs)).all()
    env.close()
