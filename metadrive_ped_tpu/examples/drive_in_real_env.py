"""ScenarioEnv demo on a self-generated dataset
(reference: examples/drive_in_real_env.py replays bundled nuScenes data;
here we export PG rollouts to ScenarioDescription pkls, then replay them —
the same record->export->replay loop, with no asset download)."""
import argparse
import tempfile

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reactive", action="store_true",
                        help="reactive traffic (TrajectoryIDMPolicy) instead "
                             "of pure replay")
    parser.add_argument("--steps", "-n", default=60, type=int)
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu import MetaDriveEnv, ScenarioEnv
    from metadrive_ped_tpu.scenario.recorder import export_scenarios
    from metadrive_ped_tpu.scenario.utils import save_dataset

    src = MetaDriveEnv(dict(num_envs=4, num_scenarios=4, map=3,
                            traffic_density=0.1))
    src.reset(seed=0)
    scenarios = list(export_scenarios(src, n_steps=100).values())
    with tempfile.TemporaryDirectory() as d:
        save_dataset(scenarios, d)
        env = ScenarioEnv(dict(num_envs=4, num_scenarios=len(scenarios),
                               data_directory=d,
                               reactive_traffic=args.reactive))
        obs, _ = env.reset(seed=0)
        rtot = 0.0
        for _ in range(args.steps):
            obs, r, term, trunc, info = env.step(np.tile([0.0, 0.4], (4, 1)))
            rtot += float(np.sum(r))
        print(f"replayed {len(scenarios)} exported scenarios for "
              f"{args.steps} steps, reward {rtot:.1f}, "
              f"route completion {np.asarray(info['route_completion']).mean():.2f}")


if __name__ == "__main__":
    main()
