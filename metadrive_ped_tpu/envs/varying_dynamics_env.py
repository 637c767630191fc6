"""VaryingDynamicsEnv — per-episode randomized ego dynamics.

Port of metadrive/envs/varying_dynamics_env.py:14-60: each episode samples
engine/brake/steering/mass/friction from the configured ranges (done inside
the jit'd spawn via the per-env PRNG, so resampling also happens on
auto-reset — matching the reference's per-seed resample)."""
from metadrive_ped_tpu.envs.metadrive_env import MetaDriveEnv


class VaryingDynamicsEnv(MetaDriveEnv):
    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(
            dict(
                random_dynamics=dict(
                    max_engine_force=(100.0, 3000.0),
                    max_brake_force=(20.0, 600.0),
                    wheel_friction=(0.1, 2.5),
                    max_steering=(10.0, 80.0),
                    mass=(300.0, 3000.0),
                )
            )
        )
        return config
