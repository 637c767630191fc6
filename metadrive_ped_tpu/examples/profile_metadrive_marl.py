"""MARL throughput profiling
(reference: examples/profile_metadrive_marl.py). Agent-steps/s over the
MultiAgentRoundaboutEnv."""
import argparse
import time

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-steps", "-n", default=100, type=int)
    parser.add_argument("--num-envs", "-e", default=64, type=int)
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu.envs.marl_envs import MultiAgentRoundaboutEnv

    env = MultiAgentRoundaboutEnv(dict(num_envs=args.num_envs))
    obs, _ = env.reset(seed=0)
    E, A = obs.shape[:2]
    act = np.tile([0.0, 0.5], (E, A, 1))
    env.step(act)  # compile
    start = time.time()
    for _ in range(args.num_steps):
        env.step(act)
    dt = time.time() - start
    rate = args.num_steps * E * A / dt
    print(f"{A} agents x {E} envs: {rate:,.0f} agent-steps/s")


if __name__ == "__main__":
    main()
