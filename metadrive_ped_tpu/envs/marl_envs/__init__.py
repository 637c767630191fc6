from metadrive_ped_tpu.envs.marl_envs.marl_env import (
    MultiAgentIntersectionEnv, MultiAgentMetaDrive, MultiAgentRoundaboutEnv
)

__all__ = ["MultiAgentMetaDrive", "MultiAgentRoundaboutEnv", "MultiAgentIntersectionEnv"]
