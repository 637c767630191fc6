"""Drive MetaDriveEnv with the built-in PPO expert
(reference: examples/drive_in_single_agent_env.py, which drives one window'd
env manually; headless here, batched, expert-driven)."""
import argparse

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", "-e", default=16, type=int)
    parser.add_argument("--steps", "-n", default=1500, type=int)
    parser.add_argument("--render", metavar="OUT.png", default=None,
                        help="save a top-down frame of env 0 at the end")
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu import MetaDriveEnv
    from metadrive_ped_tpu.policies.expert import make_expert_policy

    env = MetaDriveEnv(dict(
        num_envs=args.num_envs, map=7, num_scenarios=20, traffic_density=0.1,
        vehicle_config=dict(lidar=dict(num_lasers=240, num_others=4)),
    ))
    env.reset(seed=0)
    policy = make_expert_policy()
    outs, mean_reward = env.rollout(
        args.steps, policy_fn=policy,
        collect=("reward", "arrive_dest", "terminated"),
    )
    rew = np.asarray(outs["reward"])
    term = np.asarray(outs["terminated"])
    succ = term & np.asarray(outs["arrive_dest"])
    print(f"{args.num_envs} envs x {args.steps} steps with the PPO expert")
    print(f"mean step reward: {float(mean_reward):.4f}")
    print(f"episodes finished: {int(term.sum())}, at destination: {int(succ.sum())}")
    print(f"total reward collected: {float(rew.sum()):.1f}")
    if args.render:
        frame = env.render("topdown")
        _save(frame, args.render)
        print("wrote", args.render)


def _save(frame, path):
    try:
        from PIL import Image
        Image.fromarray(np.asarray(frame)).save(path)
    except ImportError:
        np.save(path + ".npy", np.asarray(frame))


if __name__ == "__main__":
    main()
