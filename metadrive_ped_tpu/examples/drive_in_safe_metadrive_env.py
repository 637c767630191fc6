"""SafeMetaDriveEnv demo: accident scenes + episode cost accounting
(reference: examples/drive_in_safe_metadrive_env.py)."""
import argparse

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", "-n", default=200, type=int)
    parser.add_argument("--num-envs", "-e", default=16, type=int)
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu import SafeMetaDriveEnv

    env = SafeMetaDriveEnv(dict(num_envs=args.num_envs, num_scenarios=10))
    env.reset(seed=0)
    act = np.tile([0.0, 1.0], (args.num_envs, 1))
    cost_total = 0.0
    for _ in range(args.steps):
        obs, r, term, trunc, info = env.step(act)
        cost_total += float(np.sum(info["cost"]))
    print(f"{args.num_envs} envs x {args.steps} full-throttle steps")
    print(f"accumulated cost {cost_total:.1f} "
          f"(crashes don't terminate in the safe env)")


if __name__ == "__main__":
    main()
