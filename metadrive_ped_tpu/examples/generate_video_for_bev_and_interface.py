"""Generate temporally-aligned BEV + dashboard videos of one episode.

Twin of the reference's generate_video_for_bev_and_interface.py
(metadrive/examples/: drives one episode with the expert and writes
``0_bev.mp4`` + ``0_interface.mp4`` via mediapy). There is no Panda3D
interface window here — the "interface" video is the DashBoard panel
render (obs/render.py:render_dashboard, the reference's
component/sensors/dashboard.py analog) stacked under the raycast camera
frame; BEV comes from env.render("topdown").

    python -m metadrive_ped_tpu.examples.generate_video_for_bev_and_interface [--cpu]

Writes example_video_<timestamp>/0_bev.mp4 and 0_interface.mp4 (falls
back to .gif when imageio has no ffmpeg writer).
"""
import argparse
import os
from datetime import datetime

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def save_video(frames, path_base, fps=25):
    import imageio

    try:
        path = path_base + ".mp4"
        imageio.mimwrite(path, frames, fps=fps)
    except Exception:
        path = path_base + ".gif"
        imageio.mimwrite(path, frames, duration=1.0 / fps)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100, help="horizon, like the reference's 100")
    p.add_argument("--bev-size", type=int, default=512)
    p.add_argument("--out", default=None)
    force_cpu_flag(p)
    args = p.parse_args()
    maybe_force_cpu(args)

    import jax.numpy as jnp

    from metadrive_ped_tpu import MetaDriveEnv
    from metadrive_ped_tpu.policies.expert import expert_action, load_expert_params

    folder = args.out or "example_video_{}".format(
        datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    )
    os.makedirs(folder, exist_ok=True)

    env = MetaDriveEnv(dict(
        num_envs=1, num_scenarios=1, start_seed=100, map=3,
        traffic_density=0.1, crash_vehicle_done=False, horizon=args.steps,
        vehicle_config=dict(lidar=dict(num_lasers=240, num_others=4)),
    ))
    obs, _ = env.reset(seed=0)
    params = load_expert_params()

    video_bev, video_interface = [], []
    for t in range(args.steps):
        action = np.asarray(jnp.clip(expert_action(params, obs), -1, 1))
        obs, r, term, trunc, info = env.step(action)
        bev = env.render("topdown", env_index=0, size=args.bev_size)
        cam = env.render("rgb_array", env_index=0, width=320, height=180)
        dash = env.render("dashboard", env_index=0, width=320, height=80)
        video_bev.append(np.asarray(bev, np.uint8))
        # "interface": camera view with the dashboard panel below, the
        # closest analog of the reference's decorated render window
        video_interface.append(
            np.concatenate([np.asarray(cam, np.uint8),
                            np.asarray(dash, np.uint8)], axis=0)
        )
        if bool(np.asarray(term)[0]):
            break

    p_bev = save_video(video_bev, os.path.join(folder, "0_bev"))
    p_int = save_video(video_interface, os.path.join(folder, "0_interface"))
    print(f"wrote {len(video_bev)} frames:")
    print(f"  {p_bev}")
    print(f"  {p_int}")


if __name__ == "__main__":
    main()
