"""Top-down (BEV) observation envs.

Reference: metadrive/envs/top_down_env.py:7-47 (TopDownSingleFrameMetaDriveEnv
returns one 84x84 frame; TopDownMetaDrive stacks frames). Map layers are
baked by the native C++ rasterizer at init; the per-step crop runs inside
the jit'd step.
"""
import jax.numpy as jnp
import numpy as np

from metadrive_ped_tpu.envs.metadrive_env import MetaDriveEnv
from metadrive_ped_tpu.obs import top_down


class TopDownSingleFrameMetaDriveEnv(MetaDriveEnv):
    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(
            dict(frame_stack=1, resolution=84, max_distance=50.0),
            allow_add_new_key=True,
        )
        return config

    def __init__(self, config=None):
        super().__init__(config)
        self._textures, self._tex_origins = top_down.bake_map_textures(
            self._pack, self.scene.num_scenarios
        )

    @property
    def observation_dim(self):
        r = self.config["resolution"]
        return (r, r, top_down.CHANNELS)

    @property
    def observation_space(self):
        import gymnasium as gym
        return gym.spaces.Box(0.0, 1.0, shape=self.observation_dim, dtype=np.float32)

    def _observe(self, state, ego_long, ego_lat):
        return top_down.observe_top_down(
            self._textures, self._tex_origins, state.sidx, state.ego, state.npc,
            state.ego.past_pos,
            resolution=self.config["resolution"],
            max_distance=self.config["max_distance"],
        )


class TopDownMetaDrive(TopDownSingleFrameMetaDriveEnv):
    """Multi-channel stacked BEV (reference TopDownMultiChannel,
    obs/top_down_obs_multi_channel.py:27-279 + envs/top_down_env.py:39-49):
    ``2 + frame_stack`` grayscale channels —

      0: road network (drivable area + lane lines, doubled intensity, with
         the ego route shaded in as the reference draws navigation onto the
         background canvas at gray 64)
      1: past ego positions, ego-frame dots (sub-sampled every frame_skip)
      2..: traffic flow at t, t-frame_skip, t-2*frame_skip, ... (newest
         first — _get_stack_indices order, :293-299)

    The traffic-flow history is a host-side rolling stack, refilled with the
    current frame on episode reset (``_should_fill_stack`` semantics,
    :243-249) — the vectorized analog refills only the done rows."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(
            dict(frame_stack=3, frame_skip=5, post_stack=5, max_distance=30.0),
            allow_add_new_key=True,
        )
        return config

    def __init__(self, config=None):
        super().__init__(config)
        self._tf_stack = None  # [E, R, R, (frame_stack-1)*frame_skip+1]

    @property
    def observation_dim(self):
        r = self.config["resolution"]
        return (r, r, 2 + self.config["frame_stack"])

    def _assemble(self, frame, done=None):
        f = np.asarray(frame)  # [E,R,R,5] single-frame channels
        road = np.clip(f[..., 0] * 2.0, 0.0, 1.0)
        road = np.maximum(road, np.clip(f[..., 1] * (64.0 / 255.0) * 2.0, 0.0, 1.0))
        past = f[..., 4]
        tf = f[..., 2]
        K, skip = self.config["frame_stack"], self.config["frame_skip"]
        buflen = (K - 1) * skip + 1
        if self._tf_stack is None or self._tf_stack.shape[:3] != tf.shape:
            self._tf_stack = np.repeat(tf[..., None], buflen, axis=-1)
        self._tf_stack = np.roll(self._tf_stack, -1, axis=-1)
        self._tf_stack[..., -1] = tf
        if done is not None and done.any():
            self._tf_stack[done] = tf[done][..., None]
        # newest first: indices length-1, length-1-skip, ...
        chans = [road, past] + [
            self._tf_stack[..., buflen - 1 - i * skip] for i in range(K)
        ]
        return np.stack(chans, axis=-1).astype(np.float32)

    def reset(self, seed=0):
        obs, info = super().reset(seed)
        self._tf_stack = None
        return self._assemble(obs), info

    def step(self, actions):
        obs, r, te, tr, info = super().step(actions)
        done = np.asarray(te) | np.asarray(tr)
        return self._assemble(obs, done), r, te, tr, info


class TopDownMetaDriveEnvV2(TopDownMetaDrive):
    """reference envs/top_down_env.py:52-75: the multi-channel env with the
    lidar stripped from the vehicle config (the obs is image-only)."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config["vehicle_config"]["lidar"].update(dict(num_lasers=0, distance=0.0))
        return config
