"""Throughput benchmark.

Mirrors the reference profiling protocol
(metadrive/examples/profile_metadrive.py:16-43 — full-throttle action,
traffic_density 0.05, FPS excluding reset) scaled to the batched TPU build:
4096 lockstep envs in one jit'd step on a single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the reference's published single-process speed
(~1500 env-steps/s on a standard PC, documentation/source/index.rst:18).
"""
import argparse
import json
import time

import numpy as np

REFERENCE_FPS = 1500.0  # BASELINE.md single-env reference


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for smoke testing")
    p.add_argument("--num-envs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--scenarios", type=int, default=None)
    p.add_argument("--density", type=float, default=0.05)
    args = p.parse_args()

    num_envs = args.num_envs or (256 if args.quick else 4096)
    steps = args.steps or (30 if args.quick else 200)
    scenarios = args.scenarios or (4 if args.quick else 16)

    import jax
    from metadrive_ped_tpu import MetaDriveEnv

    env = MetaDriveEnv(
        dict(
            num_envs=num_envs,
            map=3,
            num_scenarios=scenarios,
            traffic_density=args.density,
            horizon=1000,
        )
    )
    obs, _ = env.reset(seed=0)
    actions = np.tile(np.array([0.0, 1.0], np.float32), (num_envs, 1))

    # on-device rollout (lax.scan): first call compiles, second is timed
    env.rollout(steps, actions=actions)
    t0 = time.perf_counter()
    env.rollout(steps, actions=actions)
    dt = time.perf_counter() - t0

    steps_per_s = num_envs * steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_1chip",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
