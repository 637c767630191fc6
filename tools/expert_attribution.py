"""Expert failure attribution on random PG maps (VERDICT r3 item 4).

The vendored PPO expert reproduces the reference's own CCC benchmark
exactly (success 1.0, reward ~327) but scores ~0.4 on random 3-block maps
with traffic. This script splits every episode termination by cause
(success / crash_vehicle / out_of_road / timeout) per seed and density,
and names the block sequence of each failing seed (maps are seed-exact, so
the block string identifies the geometry the expert fails on).

Reference protocol analog: tests/test_policy/test_expert_performance.py:37-41
drives the expert over a traffic grid and asserts aggregate success; this
adds the attribution that the test's single number hides.

    python tools/expert_attribution.py [--seeds 16] [--envs 64] [--cpu]
"""
import argparse
import os
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=16, help="num_scenarios")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--density", type=float, nargs="*", default=[0.0, 0.05, 0.1])
    ap.add_argument("--map", default="3")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from metadrive_ped_tpu import MetaDriveEnv
    from metadrive_ped_tpu.policies.expert import expert_action, load_expert_params

    params = load_expert_params()
    pol = lambda obs, state: jnp.clip(expert_action(params, obs), -1, 1)
    map_cfg = int(args.map) if args.map.isdigit() else args.map

    for density in args.density:
        env = MetaDriveEnv(dict(
            num_envs=args.envs, map=map_cfg, num_scenarios=args.seeds,
            traffic_density=density, horizon=1000,
            vehicle_config=dict(lidar=dict(num_lasers=240, num_others=4)),
        ))
        env.reset(seed=0)
        outs, _ = env.rollout(
            args.steps, policy_fn=pol,
            collect=("terminated", "truncated", "arrive_dest", "crash_vehicle",
                     "out_of_road", "env_seed"),
        )
        term = np.asarray(outs["terminated"]) | np.asarray(outs["truncated"])
        cause = np.where(
            np.asarray(outs["arrive_dest"]), 0,
            np.where(np.asarray(outs["crash_vehicle"]), 1,
                     np.where(np.asarray(outs["out_of_road"]), 2, 3)),
        )
        names = ["success", "crash_vehicle", "out_of_road", "timeout"]
        tot = Counter()
        per_seed = defaultdict(Counter)
        seeds = np.asarray(outs["env_seed"])
        for t, e in zip(*np.nonzero(term)):
            c = names[cause[t, e]]
            tot[c] += 1
            per_seed[int(seeds[t, e])][c] += 1
        n = sum(tot.values())
        from metadrive_ped_tpu.mapgen.big import generate_map
        blocks = {}
        for s in per_seed:
            _, blks = generate_map(
                s, dict(config=map_cfg, lane_width=3.5, lane_num=3,
                        exit_length=50.0)
            )
            blocks[s] = "".join(b.ID for b in blks[1:])
        print(f"\n== density {density}: {n} episodes ==")
        for c in names:
            print(f"  {c:14s} {tot[c]:4d}  ({tot[c] / max(n, 1):.1%})")
        print("  worst seeds (success rate | blocks | cause mix):")
        rows = sorted(
            per_seed.items(),
            key=lambda kv: kv[1]["success"] / max(sum(kv[1].values()), 1),
        )
        for s, cnt in rows[:8]:
            sr = cnt["success"] / max(sum(cnt.values()), 1)
            mix = " ".join(f"{k}:{v}" for k, v in cnt.items() if k != "success")
            print(f"    seed {s:3d}  {sr:.2f}  {blocks.get(s, '?'):10s}  {mix}")
        env.close()


if __name__ == "__main__":
    main()
