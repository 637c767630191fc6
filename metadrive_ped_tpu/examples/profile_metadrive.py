"""Throughput profiling, reproducing the reference protocol
(examples/profile_metadrive.py:14-41: 1000 PG maps from start_seed 1010,
traffic_density 0.05, full-throttle action, FPS excluding reset time) —
but over a lockstep env batch with auto-reset, so "FPS" is aggregate
env-steps/s."""
import argparse
import time

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-steps", "-n", default=200, type=int,
                        help="per-env steps to profile")
    parser.add_argument("--num-envs", "-e", default=1024, type=int)
    parser.add_argument("--num-scenarios", default=100, type=int,
                        help="reference uses 1000; map compile is host-side")
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu import MetaDriveEnv

    print(f"Profiling: {args.num_envs} lockstep envs, "
          f"{args.num_scenarios} maps, traffic_density=0.05")
    env = MetaDriveEnv(dict(
        num_envs=args.num_envs, num_scenarios=args.num_scenarios,
        start_seed=1010, traffic_density=0.05,
    ))
    env.reset(seed=0)
    action = np.tile([0.0, 1.0], (args.num_envs, 1))
    env.step(action)  # compile
    start = time.time()
    for s in range(args.num_steps):
        env.step(action)  # auto_reset handles terminations in-graph
        if (s + 1) % 50 == 0:
            fps = (s + 1) * args.num_envs / (time.time() - start)
            print(f"Finish {s + 1}/{args.num_steps} steps. "
                  f"Aggregate env-steps/s: {fps:,.0f}")
    dt = time.time() - start
    print(f"Total Time Elapse: {dt:.3f}, aggregate env-steps/s: "
          f"{args.num_steps * args.num_envs / dt:,.0f}")


if __name__ == "__main__":
    main()
