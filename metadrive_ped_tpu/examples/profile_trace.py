"""Device-op profiling: trace one on-device rollout with jax.profiler and
print the per-op time table parsed from the trace (the committed form of
the recipe used to find the round-1/2 hot spots — one-hot contractions,
scalar gathers).

    python -m metadrive_ped_tpu.examples.profile_trace --config pg
    python -m metadrive_ped_tpu.examples.profile_trace --config scenario --num-envs 512

SURVEY.md section 5 tracing/profiling: the reference profiles with cProfile
over its Python loop; the TPU build's step is one XLA program, so the
actionable profile is the device trace (fusions + their ms).
"""
import argparse
import glob
import gzip
import json
import tempfile
import time
from collections import defaultdict

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def _make_env(config, num_envs, scenarios):
    if config == "pg":
        from metadrive_ped_tpu import MetaDriveEnv
        return MetaDriveEnv(dict(num_envs=num_envs, map=3,
                                 num_scenarios=scenarios, traffic_density=0.05))
    if config == "marl":
        from metadrive_ped_tpu import MultiAgentRoundaboutEnv
        return MultiAgentRoundaboutEnv(dict(num_envs=num_envs))
    if config == "scenario":
        from metadrive_ped_tpu import MetaDriveEnv
        from metadrive_ped_tpu.envs.scenario_env import ScenarioEnv
        from metadrive_ped_tpu.scenario.recorder import export_scenarios
        from metadrive_ped_tpu.scenario.utils import save_dataset
        src = MetaDriveEnv(dict(num_envs=scenarios, num_scenarios=scenarios,
                                map=3, traffic_density=0.1))
        src.reset(seed=0)
        d = tempfile.mkdtemp()
        save_dataset(list(export_scenarios(src, n_steps=100).values()), d)
        return ScenarioEnv(dict(num_envs=num_envs, num_scenarios=scenarios,
                                data_directory=d, reactive_traffic=True))
    if config == "scenario_waymo":
        # Waymo-scale synthetic pack (bench.py --config scenario shapes)
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"))
        bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
        from metadrive_ped_tpu.envs.scenario_env import ScenarioEnv
        sds = [bench._synthetic_waymo_sd(s) for s in range(scenarios)]
        return ScenarioEnv(dict(num_envs=num_envs, scenario_data=sds,
                                reactive_traffic=True))
    if config == "scenario_replay":
        # the reference's Waymo-replay FPS protocol (bench.py
        # --config scenario_replay shapes: replay ego, 120+160+12 lasers)
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"))
        bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
        from metadrive_ped_tpu.envs.scenario_env import ScenarioEnv
        sds = [bench._synthetic_waymo_sd(s) for s in range(scenarios)]
        return ScenarioEnv(dict(
            num_envs=num_envs, scenario_data=sds, replay_ego=True,
            vehicle_config=dict(
                lidar=dict(num_lasers=120),
                side_detector=dict(num_lasers=160),
                lane_line_detector=dict(num_lasers=12),
            ),
        ))
    raise ValueError(config)


def parse_trace(logdir, top=25):
    """Sum per-op durations from the newest trace.json.gz under logdir."""
    paths = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    events = json.load(gzip.open(sorted(paths)[-1]))["traceEvents"]
    totals = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            totals[e.get("name", "?")] += e["dur"]
    return sorted(totals.items(), key=lambda kv: -kv[1])[:top]


def main():
    import jax
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="pg", choices=("pg", "marl", "scenario", "scenario_waymo", "scenario_replay"))
    p.add_argument("--num-envs", "-e", type=int, default=1024)
    p.add_argument("--num-steps", "-n", type=int, default=50)
    p.add_argument("--num-scenarios", type=int, default=16)
    p.add_argument("--logdir", default=None)
    force_cpu_flag(p)
    args = p.parse_args()
    maybe_force_cpu(args)

    env = _make_env(args.config, args.num_envs, args.num_scenarios)
    env.reset(seed=0)
    rows = env.num_envs
    acts = np.tile(np.array([0.0, 1.0], np.float32), (rows, 1))
    env.rollout(args.num_steps, actions=acts)  # compile
    t0 = time.perf_counter()
    env.rollout(args.num_steps, actions=acts)
    dt = time.perf_counter() - t0
    print(f"{rows * args.num_steps / dt:,.0f} env-steps/s "
          f"({rows} envs x {args.num_steps} steps in {dt * 1e3:.1f} ms)")

    logdir = args.logdir or tempfile.mkdtemp(prefix="mdtpu_trace_")
    with jax.profiler.trace(logdir):
        env.rollout(args.num_steps, actions=acts)
        jax.block_until_ready(env._state.ego.pos)
    print(f"trace: {logdir}")
    for name, us in parse_trace(logdir):
        print(f"{us / 1000:10.2f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
