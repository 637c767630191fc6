"""Procedural map generation demo: compile scenes, dump/reload a map pack
(reference: examples/procedural_generation.py renders BIG maps; the TPU
build's artifact is the compiled scene pack)."""
import argparse
import os
import tempfile

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-maps", default=8, type=int)
    parser.add_argument("--blocks", default=5, type=int)
    force_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from metadrive_ped_tpu import MetaDriveEnv

    env = MetaDriveEnv(dict(num_envs=2, map=args.blocks,
                            num_scenarios=args.num_maps))
    pack = env._pack
    print(f"compiled {args.num_maps} maps of {args.blocks} blocks:")
    print(f"  lanes per scene:    {pack['lane_kind'].shape[1]}")
    print(f"  roads per scene:    {pack['road_lane0'].shape[1]}")
    print(f"  boundary segments:  {pack['seg_p0'].shape[1]}")
    print(f"  block strings:      {[s for s in pack.get('block_string', [b''] * 0)][:4]}")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "maps.pkl")
        env.dump_all_maps(path)
        size = os.path.getsize(path)
        env2 = MetaDriveEnv(dict(num_envs=2, map=args.blocks,
                                 num_scenarios=args.num_maps,
                                 map_pack_file=path))
        env2.reset(seed=0)
        print(f"  pack dump/reload OK ({size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
