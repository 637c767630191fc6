"""Torch twin of the PPO expert (reference:
metadrive/examples/ppo_expert/torch_expert.py:39-95).

Same vendored checkpoint, same 275 -> 256 -> 256 -> 4 tanh MLP, same
obs-correction (flip dims 10/15), batched over the env axis. The JAX
expert (policies/expert.py) is the fast path used inside rollouts; this
twin exists for API parity with the reference's torch entry point and for
users embedding the expert in torch training loops. Verified equal to the
JAX expert in tests/test_policies.py.
"""
import numpy as np

from metadrive_ped_tpu.policies.expert import _DEFAULT_WEIGHT_PATHS

_cache = {}


def load_torch_expert_weights(path=None, device=None):
    """Load the vendored checkpoint as torch tensors (numpy_to_torch twin,
    torch_expert.py:21-33)."""
    import torch

    device = device or torch.device("cpu")
    key = (path, str(device))
    if key in _cache:
        return _cache[key]
    import os
    paths = (path,) if path else _DEFAULT_WEIGHT_PATHS
    for p in paths:
        if p and os.path.exists(p):
            w = np.load(p)
            out = {k: torch.from_numpy(np.asarray(w[k])).to(device) for k in w.keys()}
            _cache[key] = out
            return out
    raise FileNotFoundError(f"expert_weights.npz not found (searched {paths})")


def torch_expert_action(obs, deterministic=True, path=None, device=None):
    """Batched expert forward in torch: obs [E,275] (numpy or tensor)
    -> actions [E,2] numpy. Mirrors torch_expert (torch_expert.py:39-95)
    minus the per-vehicle observe() (the TPU build observes in-kernel)."""
    import torch

    w = load_torch_expert_weights(path, device)
    with torch.no_grad():
        x = torch.as_tensor(np.asarray(obs), dtype=torch.float32)
        if x.ndim == 1:
            x = x[None]
        # obs_correction (torch_expert.py:15-18)
        x = x.clone()
        x[..., 15] = 1.0 - x[..., 15]
        x[..., 10] = 1.0 - x[..., 10]
        x = torch.tanh(x @ w["default_policy/fc_1/kernel"] + w["default_policy/fc_1/bias"])
        x = torch.tanh(x @ w["default_policy/fc_2/kernel"] + w["default_policy/fc_2/bias"])
        x = x @ w["default_policy/fc_out/kernel"] + w["default_policy/fc_out/bias"]
        mean, log_std = torch.split(x, 2, dim=-1)
        if not deterministic:
            mean = mean + torch.exp(log_std) * torch.randn_like(mean)
        return mean.cpu().numpy()
