"""Top-down BEV observation demo
(reference: examples/top_down_metadrive.py)."""
import argparse

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", "-n", default=50, type=int)
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu.envs.top_down_env import TopDownMetaDrive

    env = TopDownMetaDrive(dict(num_envs=4, num_scenarios=4))
    obs, _ = env.reset(seed=0)
    print("BEV obs:", obs.shape, obs.dtype)  # [E, 84, 84, 5]
    for _ in range(args.steps):
        obs, r, term, trunc, info = env.step(np.tile([0.0, 0.8], (4, 1)))
    o = np.asarray(obs)
    print(f"after {args.steps} steps: occupancy "
          f"{float((o > 0).mean()):.3f}, max {float(o.max()):.2f}")


if __name__ == "__main__":
    main()
