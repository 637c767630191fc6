"""Top-down BEV observation + native rasterizer
(reference: obs/top_down_obs.py, obs/top_down_obs_multi_channel.py)."""
import numpy as np
import pytest

from metadrive_ped_tpu.native import native_available, rasterize_polylines


def test_native_rasterizer_capsule_coverage():
    grid = np.zeros((100, 100), np.float32)
    rasterize_polylines(grid, (0.0, 0.0), 1.0, [np.array([[10, 50], [90, 50]])], [10.0])
    covered = int((grid > 0).sum())
    assert 800 <= covered <= 1100  # 80x10 core + end caps


def test_native_lib_compiles():
    assert native_available(), "g++ is in the image; the native lib should build"


@pytest.fixture(scope="module")
def td_env():
    from metadrive_ped_tpu.envs.top_down_env import TopDownSingleFrameMetaDriveEnv
    env = TopDownSingleFrameMetaDriveEnv(
        dict(num_envs=2, map="CS", num_scenarios=1, traffic_density=0.4,
             traffic_mode="respawn")
    )
    env.reset(seed=0)
    return env


def test_top_down_obs_shape_and_layers(td_env):
    obs, _ = td_env.reset(seed=0)
    o = np.asarray(obs)
    assert o.shape == (2, 84, 84, 5)
    assert 0.02 < o[..., 0].mean() < 0.9, "road layer should cover part of the frame"
    assert o[..., 3].sum(axis=(1, 2)).min() >= 1, "ego box must be stamped"
    assert ((o >= 0) & (o <= 1)).all()


def test_top_down_ego_centered(td_env):
    obs, _ = td_env.reset(seed=0)
    o = np.asarray(obs)[0, ..., 3]
    ys, xs = np.nonzero(o)
    assert abs(ys.mean() - 42) < 4 and abs(xs.mean() - 42) < 4


def test_top_down_moves_with_vehicle(td_env):
    obs0, _ = td_env.reset(seed=0)
    for _ in range(12):
        obs, r, te, tr, info = td_env.step(np.tile([0.0, 1.0], (2, 1)))
    # road layer content changes as the window moves along the map
    assert not np.allclose(np.asarray(obs0)[0, ..., 0], np.asarray(obs)[0, ..., 0])


def test_top_down_multi_channel_stacking():
    """TopDownMetaDrive: 2+frame_stack channels; the traffic-flow channels
    are real history — after >frame_skip steps of motion, t and t-skip
    frames of a moving NPC must differ (top_down_obs_multi_channel.py:
    250-279 stacked traffic flow, newest first)."""
    import numpy as np
    from metadrive_ped_tpu import TopDownMetaDrive, TopDownMetaDriveEnvV2
    env = TopDownMetaDrive(dict(
        num_envs=2, map="S", num_scenarios=1, traffic_density=0.6,
        traffic_mode="respawn", resolution=64,
    ))
    obs, _ = env.reset(seed=0)
    assert obs.shape == (2, 64, 64, 5)  # road + past_pos + 3 stacked frames
    assert env.observation_dim == (64, 64, 5)
    # at reset the stack is filled with the current frame -> all equal
    np.testing.assert_allclose(obs[..., 2], obs[..., 4])
    saw_traffic = saw_history = False
    for _ in range(70):  # drive into lidar range of the respawn traffic
        obs, r, te, tr, info = env.step(np.tile([0.0, 1.0], (2, 1)))
        saw_traffic = saw_traffic or bool((obs[..., 2] > 0).any())
        saw_history = saw_history or bool((obs[..., 2] != obs[..., 4]).any())
    assert obs.shape == (2, 64, 64, 5)
    assert np.isfinite(obs).all() and obs.min() >= 0.0 and obs.max() <= 1.0
    assert saw_traffic, "traffic-flow channel must show NPCs"
    assert saw_history, (
        "traffic-flow history must differ from the live frame after motion"
    )
    assert (obs[..., 0] > 0).any(), "road channel must show drivable area"
    env.close()

    v2 = TopDownMetaDriveEnvV2(dict(num_envs=1, map="S", num_scenarios=1,
                                    resolution=64))
    assert v2.config["vehicle_config"]["lidar"]["num_lasers"] == 0
    o2, _ = v2.reset(seed=0)
    assert o2.shape == (1, 64, 64, 5)
    v2.close()
