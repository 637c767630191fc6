"""Worker process for the 2-process jax.distributed smoke test
(launched by tests/test_parallel.py::test_two_process_distributed).

Each process owns a strided slice of the PG scenario set (worker_index /
num_workers — the multi-host recipe from parallel/mesh.py), steps its own
env batch, and allgathers the per-host mean reward across processes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)

    import numpy as np
    from jax.experimental import multihost_utils
    from metadrive_ped_tpu import MetaDriveEnv
    from metadrive_ped_tpu.parallel import init_distributed  # noqa: F401 (API surface)

    env = MetaDriveEnv(dict(
        num_envs=8, map="S", num_scenarios=4, traffic_density=0.0,
        worker_index=pid, num_workers=nproc,
    ))
    env.reset(seed=pid)
    r = info = None
    for _ in range(3):
        obs, r, te, tr, info = env.step(np.tile([0.0, 1.0], (8, 1)))
    local_seeds = sorted(set(int(s) for s in np.asarray(info["env_seed"])))
    mean_r = float(np.asarray(r).mean())
    gathered = multihost_utils.process_allgather(jax.numpy.asarray(mean_r))
    print(
        "RESULT",
        pid,
        jax.process_count(),
        len(jax.devices()),
        ",".join(map(str, local_seeds)),
        ",".join(f"{float(x):.6f}" for x in np.asarray(gathered).ravel()),
        flush=True,
    )


if __name__ == "__main__":
    main()
