"""PPO expert policy (batched JAX forward).

Architecture matches the reference numpy expert
(metadrive/examples/ppo_expert/numpy_expert.py:1-80): 275 -> 256 -> 256 ->
4 with tanh activations; output splits into (mean, log_std); the
obs-correction flips dims 10 and 15 (coordinate-convention fix). The
reference's released checkpoint asset (expert_weights.npz) is vendored in
metadrive_ped_tpu/assets/, so the policy works standalone; a missing
checkpoint is a hard error unless zero-init is explicitly requested
(allow_zero_init=True).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

_VENDORED = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "assets", "expert_weights.npz")
_DEFAULT_WEIGHT_PATHS = (
    os.environ.get("METADRIVE_EXPERT_WEIGHTS", ""),
    _VENDORED,
)

OBS_DIM = 275


def load_expert_params(path=None, allow_zero_init=False):
    """Returns dict of jnp arrays (w1,b1,w2,b2,w3,b3).

    Raises FileNotFoundError when no checkpoint is found, unless
    allow_zero_init=True (action = straight coast, smoke-driving only)."""
    paths = (path,) if path else _DEFAULT_WEIGHT_PATHS
    for p in paths:
        if p and os.path.exists(p):
            w = np.load(p)
            return dict(
                w1=jnp.asarray(w["default_policy/fc_1/kernel"]),
                b1=jnp.asarray(w["default_policy/fc_1/bias"]),
                w2=jnp.asarray(w["default_policy/fc_2/kernel"]),
                b2=jnp.asarray(w["default_policy/fc_2/bias"]),
                w3=jnp.asarray(w["default_policy/fc_out/kernel"]),
                b3=jnp.asarray(w["default_policy/fc_out/bias"]),
            )
    if not allow_zero_init:
        raise FileNotFoundError(
            f"expert_weights.npz not found (searched {paths}); pass "
            "allow_zero_init=True for an explicit zero-initialized smoke policy"
        )
    from metadrive_ped_tpu.core.logger import get_logger
    get_logger().warning(
        "expert weights zero-initialized (allow_zero_init=True): the policy "
        "coasts straight; vendored checkpoint not loaded",
        extra={"log_once": True},
    )
    return dict(
        w1=jnp.zeros((OBS_DIM, 256)), b1=jnp.zeros(256),
        w2=jnp.zeros((256, 256)), b2=jnp.zeros(256),
        w3=jnp.zeros((256, 4)), b3=jnp.zeros(4),
    )


def obs_correction(obs):
    """Flip dims 10 and 15 (numpy_expert.py:36-40)."""
    obs = obs.at[..., 15].set(1.0 - obs[..., 15])
    obs = obs.at[..., 10].set(1.0 - obs[..., 10])
    return obs


def expert_action(params, obs, rng=None, deterministic=True):
    """Batched expert forward: obs [E,275] -> actions [E,2]."""
    x = obs_correction(obs)
    x = jnp.tanh(x @ params["w1"] + params["b1"])
    x = jnp.tanh(x @ params["w2"] + params["b2"])
    x = x @ params["w3"] + params["b3"]
    mean, log_std = x[..., :2], x[..., 2:]
    if deterministic or rng is None:
        return mean
    return mean + jnp.exp(log_std) * jax.random.normal(rng, mean.shape)


def make_expert_policy(path=None, deterministic=True):
    """Returns policy_fn(obs, state) -> actions, for BaseVectorEnv.rollout."""
    params = load_expert_params(path)

    def policy_fn(obs, state):
        return expert_action(params, obs, deterministic=deterministic)

    return policy_fn
