"""Sharding-overhead study on virtual CPU devices (README table).

All virtual devices share the same silicon, so an N-device run does the
same total FLOPs as a 1-device run with the same TOTAL env count — any
throughput difference IS the cost of SPMD partitioning (sharded layouts,
boundary reshards; the env axis itself needs zero hot-loop collectives).
For each device count we therefore run the SAME total env batch twice:

  unsharded: 1 virtual device,  E = devices * envs_per_device
  sharded:   N virtual devices, E = devices * envs_per_device (ShardedEnv)

and report sharded/unsharded throughput. At realistic per-device batches
(>=256 envs/device) the partitioning overhead must amortize to ~1.0x; the
round-2 table's 0.77x at 8 devices came from tiny 64-env shards where the
per-shard kernels were too small to hide the partitioning bookkeeping.

    python examples/scaling_table.py [--envs-per-device 256] [--steps 30]
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%(n)d"
import jax
jax.config.update("jax_platforms", "cpu")
import json, time
import numpy as np
from metadrive_ped_tpu import MetaDriveEnv
from metadrive_ped_tpu.parallel import ShardedEnv
if "%(config)s" == "scenario":
    from metadrive_ped_tpu.envs.scenario_env import ScenarioEnv
    from metadrive_ped_tpu.scenario import export_scenarios
    src = MetaDriveEnv(dict(num_envs=4, map="CS", num_scenarios=4,
                            traffic_density=0.4, traffic_mode="respawn"))
    src.reset(seed=0)
    sds = list(export_scenarios(
        src, 60, actions=np.tile([0.0, 0.7], (4, 1)).astype(np.float32)
    ).values())
    env = ScenarioEnv(dict(num_envs=%(num_envs)d, scenario_data=sds,
                           reactive_traffic=True))
else:
    env = MetaDriveEnv(dict(
        num_envs=%(num_envs)d, map=3, num_scenarios=8, traffic_density=0.05))
if %(n)d > 1:
    env = ShardedEnv(env)
env.reset(seed=0)
acts = np.tile([0.0, 1.0], (%(num_envs)d, 1)).astype(np.float32)
env.rollout(%(steps)d, actions=acts)      # compile
t0 = time.perf_counter()
env.rollout(%(steps)d, actions=acts)
dt = time.perf_counter() - t0
print(json.dumps(dict(devices=%(n)d, num_envs=%(num_envs)d,
                      steps_per_s=%(num_envs)d * %(steps)d / dt)))
"""


def _run(n, num_envs, steps, config="pg"):
    code = _WORKER % dict(n=n, num_envs=num_envs, steps=steps, config=config)
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=ROOT, capture_output=True,
        text=True, timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    row = json.loads(line)
    print(line, flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs-per-device", type=int, default=256)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    p.add_argument("--config", default="pg", choices=("pg", "scenario"),
                   help="env family (VERDICT r3 item 3: sharding must hold "
                        "for BOTH families)")
    args = p.parse_args()

    rows = []
    for n in args.devices:
        total = n * args.envs_per_device
        base = _run(1, total, args.steps, args.config)  # same total, unsharded
        shard = _run(n, total, args.steps, args.config) if n > 1 else base
        rows.append((n, total, base["steps_per_s"], shard["steps_per_s"]))

    print("\n| devices | total envs | unsharded steps/s | sharded steps/s | overhead |")
    print("|---|---|---|---|---|")
    for n, total, b, s in rows:
        print(f"| {n} | {total} | {b:,.0f} | {s:,.0f} | {1 - s / b:+.1%} |")


if __name__ == "__main__":
    main()
