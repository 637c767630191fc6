"""Installation self-check
(reference: examples/verify_headless_installation.py checks offscreen
rendering; here: backend + env step + obs invariants + camera obs)."""
import argparse

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def main():
    parser = argparse.ArgumentParser()
    force_cpu_flag(parser)
    maybe_force_cpu(parser.parse_args())
    import jax

    print("jax backend:", jax.default_backend(), "devices:", jax.devices())

    from metadrive_ped_tpu import MetaDriveEnv

    env = MetaDriveEnv(dict(num_envs=2, map="CS", num_scenarios=1,
                            traffic_density=0.1))
    obs, _ = env.reset(seed=0)
    for _ in range(5):
        obs, r, term, trunc, info = env.step(np.tile([0.0, 1.0], (2, 1)))
    o = np.asarray(obs)
    assert np.isfinite(o).all() and (o >= 0).all() and (o <= 1).all()
    print("vector obs OK:", o.shape)

    cam = MetaDriveEnv(dict(num_envs=2, map="S", num_scenarios=1,
                            image_observation=True,
                            sensors=dict(main_camera=("rgb", 64, 64))))
    obs, _ = cam.reset(seed=0)
    img = np.asarray(obs["image"])
    assert img.shape[1:3] == (64, 64) and np.isfinite(img).all()
    print("camera obs OK:", img.shape)
    print("Successfully verify the headless installation!")


if __name__ == "__main__":
    main()
