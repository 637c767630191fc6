"""Camera observations (reference: obs/image_obs.py + sensors/*_camera.py,
tests/test_sensors/; rendered TPU-side by ops/camera.py raycasting)."""
import numpy as np
import pytest

from metadrive_ped_tpu import MetaDriveEnv
from metadrive_ped_tpu.ops.camera import SEMANTIC_PALETTE, SEM_SKY, SEM_ROAD, SEM_CAR


def make_env(modality, w=32, h=24, **over):
    cfg = dict(
        num_envs=2, map="SS", num_scenarios=1, traffic_density=0.3,
        image_observation=True, sensors=dict(main_camera=(modality, w, h)),
    )
    cfg.update(over)
    return MetaDriveEnv(cfg)


@pytest.mark.parametrize("modality,channels", [
    ("rgb", 3), ("depth", 1), ("semantic", 3), ("instance", 3),
])
def test_camera_shapes_and_range(modality, channels):
    env = make_env(modality)
    obs, info = env.reset(seed=0)
    assert set(obs.keys()) == {"image", "state"}
    img = obs["image"]
    assert img.shape == (2, 24, 32, channels, 3)  # [E, H, W, C, stack]
    assert img.dtype == np.float32
    assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0
    # observation space matches
    sp = env.observation_space["image"]
    assert sp.shape == img.shape[1:]


def test_camera_frame_stack_rolls():
    env = make_env("depth")
    obs, _ = env.reset(seed=0)
    first = obs["image"][..., -1].copy()
    # reset: only the newest slot is filled
    assert (obs["image"][..., 0] == 0).all()
    obs, *_ = env.step(np.zeros((2, 2), np.float32))
    # previous newest frame moved one slot back
    assert np.allclose(obs["image"][..., -2], first)


def test_semantic_contents():
    env = make_env("semantic", w=64, h=48, traffic_density=0.5, map="SSS")
    obs, _ = env.reset(seed=0)
    for _ in range(5):
        obs, *_ = env.step(np.tile([0.0, 1.0], (2, 1)))
    img = obs["image"][0, ..., -1]
    sky = (np.abs(img - SEMANTIC_PALETTE[SEM_SKY]) < 1e-3).all(-1)
    road = (np.abs(img - SEMANTIC_PALETTE[SEM_ROAD]) < 1e-3).all(-1)
    car = (np.abs(img - SEMANTIC_PALETTE[SEM_CAR]) < 1e-3).all(-1)
    assert sky[:8].all(), "sky above the horizon"
    assert road.sum() > 100, "road fills the lower image"
    assert car.any(), "NPC traffic ahead shows as CAR pixels"
    assert road[:8].sum() == 0, "no road above the horizon"


def test_depth_monotone_with_rows():
    """On an empty straight road, depth decreases toward the bottom rows
    (closer ground)."""
    env = make_env("depth", traffic_density=0.0)
    obs, _ = env.reset(seed=0)
    img = obs["image"][0, :, :, 0, -1]
    bottom = img[-4:].mean()
    mid = img[img.shape[0] // 2 + 1:img.shape[0] // 2 + 5].mean()
    assert bottom < mid, "closer ground rows must have smaller depth"


def test_instance_unique_colors():
    env = make_env("instance", w=64, h=48, traffic_density=0.5, map="SSS")
    obs, _ = env.reset(seed=0)
    for _ in range(5):
        obs, *_ = env.step(np.tile([0.0, 1.0], (2, 1)))
    img = obs["image"][0, ..., -1]
    nz = img[(img > 0).any(-1)]
    colors = np.unique(np.round(nz * 255).astype(int), axis=0)
    assert len(colors) >= 1, "at least one instance visible"


def test_uint8_mode():
    env = make_env("rgb", norm_pixel=False)
    obs, _ = env.reset(seed=0)
    assert obs["image"].dtype == np.uint8
    assert obs["image"].max() > 1


def test_mini_map_sensor_observation():
    """MiniMap panel sensor (component/sensors/mini_map.py): BEV camera
    aimed 20 m ahead, usable as image_source like any camera."""
    import numpy as np
    from metadrive_ped_tpu import MetaDriveEnv
    env = MetaDriveEnv(dict(
        num_envs=2, map="SC", num_scenarios=1, traffic_density=0.2,
        image_observation=True, image_source="mini_map",
        sensors=dict(mini_map=("mini_map", 84, 42)), stack_size=2,
    ))
    obs, _ = env.reset(seed=0)
    img = obs["image"] if isinstance(obs, dict) else obs
    img = np.asarray(img)
    assert img.shape == (2, 42, 84, 3, 2)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # the road layer must actually contain road pixels ahead of the ego
    assert (img[..., 0, -1] > 0.1).mean() > 0.05, "road channel looks empty"
    env.close()


def test_dashboard_render():
    """DashBoard panel (component/sensors/dashboard.py): speed/steering/
    throttle/brake bars as an RGB array (GUI-only in the reference — its
    perceive() raises; here it renders next to env.render frames)."""
    import numpy as np
    from metadrive_ped_tpu import MetaDriveEnv
    env = MetaDriveEnv(dict(num_envs=2, map="S", num_scenarios=1,
                            traffic_density=0.0))
    env.reset(seed=0)
    for _ in range(5):
        env.step(np.tile([0.3, 0.8], (2, 1)))
    img = env.render(mode="dashboard", env_index=0)
    assert img.shape == (80, 320, 3) and img.dtype == np.uint8
    # throttle bar (row band 2) must be partially lit
    assert (img[20:40] > 100).any()
    env.close()
