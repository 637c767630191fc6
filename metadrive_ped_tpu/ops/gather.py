"""Fast table lookups for TPU.

XLA lowers pointwise gathers (a[sidx, idx] with per-env indices) to the
scalar-gather slow path on TPU (~10 ns/element serialized) — profiling showed
~30 such gathers dominating the step. Small-table lookups are instead done as
one-hot contractions, which run on the MXU/VPU at full rate.

Two shapes:
- flat one-hot over S*K rows when the table is small (single big matmul)
- per-env batched contraction otherwise (row-gather the env's scenario block,
  then contract within the row)
"""
import jax.numpy as jnp

_FLAT_LIMIT = 4096  # flat one-hot when S*K is at most this


def table_lookup(table, sidx, idx):
    """Gather rows from a stacked per-scenario table.

    table: [S, K, F] float32; sidx: [E]; idx: [E] or [E, N] (entries outside
    [0, K) yield zero rows). Returns [*idx.shape, F].
    """
    S, K, F = table.shape
    oh_dtype = table.dtype
    if S * K <= _FLAT_LIMIT:
        flat = table.reshape(S * K, F)
        if idx.ndim == 1:
            fid = sidx * K + idx
        else:
            fid = sidx[:, None] * K + idx
        oh = (fid[..., None] == jnp.arange(S * K)).astype(oh_dtype)
        return oh @ flat
    block = table[sidx]  # [E, K, F] row gather (fast path)
    oh = (idx[..., None] == jnp.arange(K)).astype(oh_dtype)
    if idx.ndim == 1:
        return jnp.einsum("ek,ekf->ef", oh, block)
    return jnp.einsum("enk,ekf->enf", oh, block)


def onehot_pick(values, idx):
    """values [E, K] (already per-env rows); idx [E] -> [E].

    Replaces take_along_axis (scalar gather) with a one-hot dot.
    """
    K = values.shape[-1]
    oh = (idx[..., None] == jnp.arange(K)).astype(values.dtype if values.dtype.kind == "f" else jnp.float32)
    if values.dtype.kind == "f":
        return (oh * values).sum(-1)
    return (oh * values.astype(jnp.float32)).sum(-1).astype(values.dtype)


def onehot_of(idx, n):
    """One-hot float mask [..., n] of integer indices (MXU/VPU-friendly
    replacement for take_along_axis on TPU)."""
    return (idx[..., None] == jnp.arange(n)).astype(jnp.float32)


def nearest_k_onehot(dist, k):
    """K rounds of min-reduce + first-tie one-hot select over the last axis.

    dist [..., N] (jnp.inf = invalid). Returns (sel [..., K, N] float one-hot
    rows, found [..., K] bool). Replaces lax.top_k + take_along_axis, which
    lower to serialized scalar gathers on TPU; this is K passes of
    VPU-friendly reduces instead (the idiom from ops/idm.py:86).
    """
    sels, founds = [], []
    d = dist
    for _ in range(k):
        m = d.min(axis=-1)
        oh = (d == m[..., None]) & jnp.isfinite(m)[..., None]
        # break ties: keep only the first hit along the axis
        oh = oh & (jnp.cumsum(oh, axis=-1) == 1)
        sels.append(oh.astype(jnp.float32))
        founds.append(jnp.isfinite(m))
        d = jnp.where(oh, jnp.inf, d)
    return jnp.stack(sels, axis=-2), jnp.stack(founds, axis=-1)


def vector_lookup(vec, idx):
    """vec [K] or [K, F] static table; idx [...]. One-hot contraction."""
    K = vec.shape[0]
    oh = (idx[..., None] == jnp.arange(K)).astype(jnp.float32)
    if vec.ndim == 1:
        if vec.dtype.kind == "f":
            return (oh * vec).sum(-1)
        return (oh * vec.astype(jnp.float32)).sum(-1).astype(vec.dtype)
    out = oh @ vec.astype(jnp.float32)
    return out.astype(vec.dtype)
