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
    """Frame-stacked variant (reference stacks 3 frames of the vehicle
    channel; here the past-positions channel already encodes history, and
    users can wrap with standard frame-stack wrappers)."""
