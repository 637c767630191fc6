"""Drive a multi-agent scene env
(reference: examples/drive_in_multi_agent_env.py — picks a MARL scene by
name and steps it). Obs/reward/done come back as [E, A, ...] arrays."""
import argparse

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu

ENVS = ("roundabout", "intersection", "tollgate", "bottleneck", "parkinglot",
        "bidirection", "racing")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="roundabout", choices=ENVS)
    parser.add_argument("--steps", "-n", default=100, type=int)
    parser.add_argument("--num-envs", "-e", default=4, type=int)
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu.envs import marl_envs as m

    cls = dict(
        roundabout=m.MultiAgentRoundaboutEnv,
        intersection=m.MultiAgentIntersectionEnv,
        tollgate=m.MultiAgentTollgateEnv,
        bottleneck=m.MultiAgentBottleneckEnv,
        parkinglot=m.MultiAgentParkingLotEnv,
        bidirection=m.MultiAgentBidirectionEnv,
        racing=m.MultiAgentRacingEnv,
    )[args.env]
    env = cls(dict(num_envs=args.num_envs))
    obs, _ = env.reset(seed=0)
    E, A = obs.shape[:2]
    print(f"{args.env}: {A} agents x {E} envs, obs dim {obs.shape[-1]}")
    actions = np.tile([0.0, 0.5], (E, A, 1))
    total_r, dones = 0.0, 0
    for _ in range(args.steps):
        obs, r, term, trunc, info = env.step(actions)
        total_r += float(np.sum(r))
        dones += int(np.sum(info["__all__"]))
    print(f"total reward {total_r:.1f}, __all__ terminations {dones}")


if __name__ == "__main__":
    main()
