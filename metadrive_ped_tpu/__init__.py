"""metadrive_ped_tpu — a TPU-native rebuild of the MetaDrive driving simulator.

The reference (zhuhaozh/metadrive_ped, /root/reference) is a single-process
Panda3D/Bullet object-graph simulator. This package inverts that design: all
per-object state lives in struct-of-arrays pytrees batched over an env axis
``[E, ...]``, and one jit-compiled ``step`` advances every environment in
lockstep on TPU. Maps are compiled host-side into fixed-size ``SceneSpec``
arrays (lane closed forms + boundary segments + routes) so procedural scene
diversity survives ``jax.jit``.

Public API mirrors the reference's env surface:
    >>> from metadrive_ped_tpu import MetaDriveEnv
    >>> env = MetaDriveEnv(dict(num_envs=1024, map="SCS"))
    >>> obs, info = env.reset(seed=0)
    >>> obs, reward, terminated, truncated, info = env.step(actions)
"""

from metadrive_ped_tpu.version import VERSION, __version__

__all__ = [
    "MetaDriveEnv", "SafeMetaDriveEnv", "VaryingDynamicsEnv", "MixedTrafficEnv", "createGymWrapper",
    "MixWaymoPGEnv", "ScenarioEnv", "TopDownMetaDrive", "TopDownMetaDriveEnvV2", "TopDownSingleFrameMetaDriveEnv",
    "MultiAgentMetaDrive", "MultiAgentRoundaboutEnv", "MultiAgentIntersectionEnv",
    "MultiAgentBottleneckEnv", "MultiAgentBidirectionEnv", "MultiAgentTollgateEnv",
    "MultiAgentParkingLotEnv", "MultiAgentRacingEnv",
    "VERSION", "__version__",
]

_ENVS = "metadrive_ped_tpu.envs"
_LAZY = {
    "MetaDriveEnv": (f"{_ENVS}.metadrive_env", "MetaDriveEnv"),
    "SafeMetaDriveEnv": (f"{_ENVS}.safe_metadrive_env", "SafeMetaDriveEnv"),
    "VaryingDynamicsEnv": (f"{_ENVS}.varying_dynamics_env", "VaryingDynamicsEnv"),
    "MixedTrafficEnv": (f"{_ENVS}.mixed_traffic_env", "MixedTrafficEnv"),
    "createGymWrapper": (f"{_ENVS}.gym_wrapper", "createGymWrapper"),
    "ScenarioEnv": (f"{_ENVS}.scenario_env", "ScenarioEnv"),
    "MixWaymoPGEnv": (f"{_ENVS}.mix_waymo_pg_env", "MixWaymoPGEnv"),
    "TopDownMetaDrive": (f"{_ENVS}.top_down_env", "TopDownMetaDrive"),
    "TopDownMetaDriveEnvV2": (f"{_ENVS}.top_down_env", "TopDownMetaDriveEnvV2"),
    "TopDownSingleFrameMetaDriveEnv": (f"{_ENVS}.top_down_env", "TopDownSingleFrameMetaDriveEnv"),
    "MultiAgentMetaDrive": (f"{_ENVS}.marl_envs", "MultiAgentMetaDrive"),
    "MultiAgentRoundaboutEnv": (f"{_ENVS}.marl_envs", "MultiAgentRoundaboutEnv"),
    "MultiAgentIntersectionEnv": (f"{_ENVS}.marl_envs", "MultiAgentIntersectionEnv"),
    "MultiAgentBottleneckEnv": (f"{_ENVS}.marl_envs", "MultiAgentBottleneckEnv"),
    "MultiAgentBidirectionEnv": (f"{_ENVS}.marl_envs", "MultiAgentBidirectionEnv"),
    "MultiAgentTollgateEnv": (f"{_ENVS}.marl_envs", "MultiAgentTollgateEnv"),
    "MultiAgentParkingLotEnv": (f"{_ENVS}.marl_envs", "MultiAgentParkingLotEnv"),
    "MultiAgentRacingEnv": (f"{_ENVS}.marl_envs", "MultiAgentRacingEnv"),
}


def __getattr__(name):
    # Lazy imports keep `import metadrive_ped_tpu` light (no jax warm-up).
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'metadrive_ped_tpu' has no attribute {name!r}")
