"""1 -> N virtual-device scaling table for the README.

Measures the ShardedEnv rollout throughput over 1/2/4/8 virtual CPU devices
(each count needs its own process: xla_force_host_platform_device_count is
fixed at backend init). The point is to validate that the env-axis sharding
scales with the mesh — absolute CPU numbers are NOT the TPU numbers
(bench.py on real hardware is).

    python examples/scaling_table.py [--num-envs 512] [--steps 50]
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
env = ShardedEnv(MetaDriveEnv(dict(
    num_envs=%(num_envs)d, map=3, num_scenarios=8, traffic_density=0.05)))
env.reset(seed=0)
acts = np.tile([0.0, 1.0], (%(num_envs)d, 1)).astype(np.float32)
env.rollout(%(steps)d, actions=acts)      # compile
t0 = time.perf_counter()
env.rollout(%(steps)d, actions=acts)
dt = time.perf_counter() - t0
print(json.dumps(dict(devices=%(n)d, steps_per_s=%(num_envs)d * %(steps)d / dt)))
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    args = p.parse_args()

    rows = []
    for n in args.devices:
        code = _WORKER % dict(n=n, num_envs=args.num_envs, steps=args.steps)
        out = subprocess.run(
            [sys.executable, "-c", code], cwd=ROOT, capture_output=True,
            text=True, timeout=900,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rows.append(json.loads(line))
        print(line, flush=True)

    base = rows[0]["steps_per_s"]
    print("\n| devices | env-steps/s (CPU) | speedup |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['devices']} | {r['steps_per_s']:,.0f} | "
              f"{r['steps_per_s'] / base:.2f}x |")


if __name__ == "__main__":
    main()
