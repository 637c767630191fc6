"""Render top-down images of procedurally generated maps
(reference: examples/draw_maps.py draws 16 maps with matplotlib)."""
import argparse

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num", default=4, type=int, help="maps to draw")
    parser.add_argument("--blocks", default=3, type=int, help="blocks per map")
    parser.add_argument("--out", default="maps.png")
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu import MetaDriveEnv

    env = MetaDriveEnv(dict(num_envs=args.num, map=args.blocks,
                            num_scenarios=args.num, traffic_density=0.0))
    env.reset(seed=0)
    frames = [np.asarray(env.render("topdown", env_index=i))
              for i in range(args.num)]
    grid = np.concatenate(frames, axis=1)
    try:
        from PIL import Image
        Image.fromarray(grid).save(args.out)
        print("wrote", args.out, grid.shape)
    except ImportError:
        np.save(args.out + ".npy", grid)
        print("PIL missing; wrote", args.out + ".npy", grid.shape)


if __name__ == "__main__":
    main()
