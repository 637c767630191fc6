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


def test_worker_striding_pg_env():
    """Multi-host env construction: each worker compiles and samples its own
    stride of the global seed set (the reference shards scenarios across ray
    workers; scenario_data_manager.py:26-32)."""
    import numpy as np
    cfgs = [dict(num_envs=32, map="S", num_scenarios=4, traffic_density=0.0,
                 worker_index=w, num_workers=2) for w in (0, 1)]
    seeds_seen = []
    for cfg in cfgs:
        env = MetaDriveEnv(cfg)
        assert env.num_scenarios == 2
        _, info = env.reset(seed=7)
        seeds_seen.append(set(int(s) for s in np.asarray(info["env_seed"])))
    assert seeds_seen[0] <= {0, 2} and seeds_seen[1] <= {1, 3}
    assert seeds_seen[0] and seeds_seen[1]


def test_two_process_distributed():
    """2-process jax.distributed smoke test on CPU (Gloo collectives): both
    processes init the runtime, see the global device count, stride the
    scenario set disjointly, and agree on the allgathered metric."""
    import socket
    import subprocess
    import sys
    import os
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_dist_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=root, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    results = {}
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, f"worker produced no RESULT:\n{out[-2000:]}"
        _, pid, nproc, ndev, seeds, gathered = lines[0].split()
        results[int(pid)] = (int(nproc), int(ndev), seeds, gathered)
    assert set(results) == {0, 1}
    for nproc, ndev, _, _ in results.values():
        assert nproc == 2
        assert ndev == 4, "2 processes x 2 virtual devices = 4 global"
    s0 = set(results[0][2].split(","))
    s1 = set(results[1][2].split(","))
    assert s0.isdisjoint(s1), "workers must own disjoint scenario strides"
    assert results[0][3] == results[1][3], \
        "allgathered metrics must agree across processes"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_scenario_env_matches_unsharded():
    """ScenarioEnv under ShardedEnv must be numerically identical to the
    unsharded run (VERDICT r3 item 3: multi-chip coverage previously
    exercised the PG family only). Uses self-exported SDs with reactive
    traffic so the trajectory-IDM path shards too."""
    from metadrive_ped_tpu.envs.scenario_env import ScenarioEnv
    from metadrive_ped_tpu.scenario import export_scenarios

    src = MetaDriveEnv(dict(num_envs=2, map="CS", num_scenarios=2,
                            traffic_density=0.5, traffic_mode="respawn"))
    src.reset(seed=0)
    sds = list(export_scenarios(
        src, 40, actions=np.tile([0.0, 0.7], (2, 1)).astype(np.float32)
    ).values())
    cfg = dict(num_envs=16, scenario_data=sds, reactive_traffic=True)
    plain = ScenarioEnv(cfg)
    sharded = ShardedEnv(ScenarioEnv(cfg))
    o1, _ = plain.reset(seed=3)
    o2, _ = sharded.reset(seed=3)
    acts = np.tile([0.05, 0.6], (16, 1)).astype(np.float32)
    for _ in range(10):
        o1, r1, *_ = plain.step(acts)
        o2, r2, t2, tr2, info2 = sharded.step(acts)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
    assert len(sharded.env._state.ego.pos.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_rollout_compiles_once():
    """Regression (round 4): ShardedEnv.reset used to shard the returned
    obs copy but leave env._last_obs unsharded, so the rollout jit saw
    different input shardings on its first vs second call and recompiled
    every other invocation — the sharding-overhead study's 'sharded'
    column was silently measuring compile time."""
    env = ShardedEnv(MetaDriveEnv(dict(num_envs=16, map="S", num_scenarios=1,
                                       traffic_density=0.1)))
    env.reset(seed=0)
    acts = np.tile([0.0, 1.0], (16, 1)).astype(np.float32)
    env.rollout(3, actions=acts)
    env.rollout(3, actions=acts)
    env.rollout(3, actions=acts)
    assert env.env._rollout_jit._cache_size() == 1, \
        "sharded rollout must reuse one executable across calls"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_marl_matches_unsharded():
    """MARL rows shard env-major over the mesh (E*A rows, whole envs per
    device), so the [E,A] mutual-lidar/collision reshapes stay local —
    sharded execution must be numerically identical to unsharded."""
    from metadrive_ped_tpu import MultiAgentRoundaboutEnv
    cfg = dict(num_envs=8, num_agents=8, delay_done=5)
    plain = MultiAgentRoundaboutEnv(cfg)
    sharded = ShardedEnv(MultiAgentRoundaboutEnv(cfg))
    o1, _ = plain.reset(seed=3)
    o2, _ = sharded.reset(seed=3)
    acts = np.tile([0.1, 0.8], (8, 8, 1)).astype(np.float32)
    for _ in range(10):
        o1, r1, *_ = plain.step(acts)
        o2, r2, *_ = sharded.step(acts)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
