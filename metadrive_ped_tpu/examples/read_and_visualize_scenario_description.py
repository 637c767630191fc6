"""Read a ScenarioDescription dataset and print a summary
(reference: examples/read_and_visualize_scenario_description.py). With no
--dataset argument, generates one from PG rollouts first."""
import argparse
import tempfile

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def describe(sd):
    meta = sd["metadata"]
    n_tracks = len(sd["tracks"])
    n_lanes = sum(1 for f in sd["map_features"].values()
                  if "LANE" in str(f.get("type", "")))
    T = len(meta["ts"])
    print(f"  scenario {meta.get('scenario_id', '?')}: {T} steps, "
          f"{n_tracks} tracks, {n_lanes} lanes, sdc={meta['sdc_id']}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default=None,
                        help="SD pkl directory (default: self-generate)")
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu.scenario.utils import load_scenarios

    if args.dataset:
        scenarios = load_scenarios(args.dataset)
        for sd in scenarios[:10]:
            describe(sd)
        return

    from metadrive_ped_tpu import MetaDriveEnv
    from metadrive_ped_tpu.scenario.recorder import export_scenarios
    from metadrive_ped_tpu.scenario.utils import save_dataset

    env = MetaDriveEnv(dict(num_envs=3, num_scenarios=3, map=3,
                            traffic_density=0.1))
    env.reset(seed=0)
    with tempfile.TemporaryDirectory() as d:
        save_dataset(list(export_scenarios(env, n_steps=50).values()), d)
        scenarios = load_scenarios(d)
        print(f"dataset at {d}: {len(scenarios)} scenarios")
        for sd in scenarios:
            describe(sd)


if __name__ == "__main__":
    main()
