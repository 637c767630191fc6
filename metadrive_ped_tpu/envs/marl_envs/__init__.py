from metadrive_ped_tpu.envs.marl_envs.marl_env import (
    MultiAgentBidirectionEnv, MultiAgentBottleneckEnv, MultiAgentIntersectionEnv,
    MultiAgentMetaDrive, MultiAgentRoundaboutEnv
)

__all__ = [
    "MultiAgentMetaDrive", "MultiAgentRoundaboutEnv", "MultiAgentIntersectionEnv",
    "MultiAgentBottleneckEnv", "MultiAgentBidirectionEnv",
]
