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


def _make_env(config_name, num_envs, scenarios):
    """The BASELINE.json config family (configs[0..4])."""
    if config_name == "pg":
        from metadrive_ped_tpu import MetaDriveEnv
        return MetaDriveEnv(dict(num_envs=num_envs, map=3,
                                 num_scenarios=scenarios,
                                 traffic_density=0.05, horizon=1000))
    if config_name == "safe":
        from metadrive_ped_tpu import SafeMetaDriveEnv
        return SafeMetaDriveEnv(dict(num_envs=num_envs,
                                     num_scenarios=scenarios, horizon=1000))
    if config_name == "marl":
        from metadrive_ped_tpu import MultiAgentRoundaboutEnv
        return MultiAgentRoundaboutEnv(dict(num_envs=num_envs))
    if config_name == "scenario":
        # self-generated SD dataset replayed with reactive IDM traffic
        import tempfile
        from metadrive_ped_tpu import MetaDriveEnv, ScenarioEnv
        from metadrive_ped_tpu.scenario.recorder import export_scenarios
        from metadrive_ped_tpu.scenario.utils import save_dataset
        src = MetaDriveEnv(dict(num_envs=scenarios, num_scenarios=scenarios,
                                map=3, traffic_density=0.1))
        src.reset(seed=0)
        d = tempfile.mkdtemp()
        save_dataset(list(export_scenarios(src, n_steps=100).values()), d)
        return ScenarioEnv(dict(num_envs=num_envs, num_scenarios=scenarios,
                                data_directory=d, reactive_traffic=True))
    raise ValueError(config_name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for smoke testing")
    p.add_argument("--num-envs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--scenarios", type=int, default=None)
    p.add_argument("--density", type=float, default=0.05)
    p.add_argument("--config", default="pg",
                   choices=("pg", "safe", "marl", "scenario"),
                   help="BASELINE.json config family; default = canonical "
                        "PG protocol (the driver's metric)")
    args = p.parse_args()

    # measured on v5e: pg 3.05M at 8192 (2.90M at 4096); safe 2.06M at 4096
    # (869k at 1024); scenario 1.17M at 1024 (751k at 512)
    default_envs = {"pg": 8192, "safe": 4096, "marl": 512, "scenario": 1024}
    num_envs = args.num_envs or (256 if args.quick else default_envs[args.config])
    steps = args.steps or (30 if args.quick else 200)
    scenarios = args.scenarios or (4 if args.quick else 16)

    env = _make_env(args.config, num_envs, scenarios)
    obs, _ = env.reset(seed=0)
    # every config runs the on-device scan path (env.rollout); MARL counts
    # agent rows (num_envs is internally E*A after __init__)
    rows = env.num_envs
    actions = np.tile(np.array([0.0, 1.0], np.float32), (rows, 1))
    # first call compiles, second is timed
    env.rollout(steps, actions=actions)
    t0 = time.perf_counter()
    env.rollout(steps, actions=actions)
    dt = time.perf_counter() - t0

    steps_per_s = rows * steps / dt
    metric = ("env_steps_per_s_1chip" if args.config == "pg"
              else f"env_steps_per_s_1chip_{args.config}")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s" if args.config != "marl" else "agent-steps/s",
                "vs_baseline": round(steps_per_s / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
