"""Sharded execution over the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""
import jax
import numpy as np
import pytest

from metadrive_ped_tpu import MetaDriveEnv
from metadrive_ped_tpu.parallel import ShardedEnv, make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_env_matches_unsharded():
    cfg = dict(num_envs=16, map="S", num_scenarios=1, traffic_density=0.1)
    plain = MetaDriveEnv(cfg)
    sharded = ShardedEnv(MetaDriveEnv(cfg))
    o1, _ = plain.reset(seed=3)
    o2, _ = sharded.reset(seed=3)
    acts = np.tile([0.1, 0.8], (16, 1)).astype(np.float32)
    for _ in range(10):
        o1, r1, *_ = plain.step(acts)
        o2, r2, t2, tr2, info2 = sharded.step(acts)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_state_lives_on_mesh():
    env = ShardedEnv(MetaDriveEnv(dict(num_envs=8, map="S", num_scenarios=1,
                                       traffic_density=0.0)))
    env.reset(seed=0)
    sharding = env.env._state.ego.pos.sharding
    assert len(sharding.device_set) == 8, "state should spread over all devices"
    obs, r, te, tr, info = env.step(np.zeros((8, 2), np.float32))
    m = env.mean_metrics(info)
    assert np.isfinite(float(m["step_reward"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
