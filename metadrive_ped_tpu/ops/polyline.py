"""Batched polyline (PointLane) geometry.

The reference's PointLane (component/lane/point_lane.py via
utils/interpolating_line.py) parametrizes recorded trajectories/scenario
lanes by arc length. Here a polyline is a fixed-size point array
[P, 2] with a valid count; all queries are nearest-segment projections,
vectorized over arbitrary batch axes.

Segment selection is done with one-hot contractions, never
take_along_axis — pointwise gathers lower to the serialized scalar-gather
slow path on TPU (see ops/gather.py).
"""
import jax.numpy as jnp


def _oh_pick(values, best, idxs):
    """Select values[..., best] via a one-hot sum over the last axis."""
    oh = (best[..., None] == idxs).astype(values.dtype)
    return (values * oh).sum(-1)


def _oh_pick_pair(pts, best):
    """Rows best and best+1 of pts [.., P, 2] from ONE contraction reading
    the path once. The mask is a single broadcast compare — building it
    with jnp.stack materialized the bool mask through a layout copy and
    regressed the scenario bench 5% (see uniform_pose). Requires
    best <= P-2."""
    P = pts.shape[-2]
    ar = jnp.arange(P)
    oh = (best[..., None, None] + jnp.arange(2)[:, None] == ar).astype(
        pts.dtype
    )                                                      # [.., 2, P]
    ab = jnp.einsum("...kp,...pd->...kd", oh, pts)         # [.., 2, 2]
    return ab[..., 0, :], ab[..., 1, :]


def arc_lengths(pts, npts):
    """Cumulative arc length [.., P]; entries past npts hold the total."""
    d = jnp.sqrt(((pts[..., 1:, :] - pts[..., :-1, :]) ** 2).sum(-1))  # [..,P-1]
    P = pts.shape[-2]
    idx = jnp.arange(P - 1)
    valid = idx < (npts[..., None] - 1)
    d = jnp.where(valid, d, 0.0)
    s = jnp.concatenate([jnp.zeros_like(d[..., :1]), jnp.cumsum(d, axis=-1)], axis=-1)
    return s


def local_coordinates(pts, npts, pos, s=None):
    """(long, lat) of pos on the polyline; pts [..,P,2], pos [..,2].

    lat sign follows the lane convention: positive to the RIGHT of travel.
    ``s`` = precomputed arc_lengths(pts, npts) (static per scenario — pass
    it from the scene pack to skip the per-step cumsum).
    """
    a = pts[..., :-1, :]
    b = pts[..., 1:, :]
    seg = b - a
    seg_len2 = (seg ** 2).sum(-1)
    idxs = jnp.arange(pts.shape[-2] - 1)
    valid = idxs < (npts[..., None] - 1)
    rel = pos[..., None, :] - a
    t = jnp.clip((rel * seg).sum(-1) / jnp.maximum(seg_len2, 1e-9), 0.0, 1.0)
    proj = a + t[..., None] * seg
    d2 = ((pos[..., None, :] - proj) ** 2).sum(-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)

    if s is None:
        s = arc_lengths(pts, npts)
    t_b = _oh_pick(t, best, idxs)
    a_b, b_b = _oh_pick_pair(pts, best)
    seg_b = b_b - a_b
    s_b = _oh_pick(s[..., :-1], best, idxs)
    seg_len = jnp.sqrt(jnp.maximum((seg_b ** 2).sum(-1), 1e-12))
    long = s_b + t_b * seg_len
    rel_b = pos - a_b
    # right-hand lateral: cross(seg_dir, rel) < 0 means left -> lat negative
    cross = seg_b[..., 0] * rel_b[..., 1] - seg_b[..., 1] * rel_b[..., 0]
    perp = jnp.sqrt(jnp.maximum((rel_b ** 2).sum(-1) - (t_b * seg_len) ** 2, 0.0))
    lat = jnp.where(cross > 0, -perp, perp)
    return long, lat


def _containing_segment(pts, npts, long, s=None):
    """Index of the last valid segment whose start arc-length <= long."""
    if s is None:
        s = arc_lengths(pts, npts)
    P = pts.shape[-2]
    seg_start = s[..., :-1]
    idxs = jnp.arange(P - 1)
    valid = idxs < (npts[..., None] - 1)
    le = (seg_start <= long[..., None]) & valid
    best = jnp.maximum(jnp.where(le, idxs, -1).max(axis=-1), 0)
    return best, seg_start, idxs


def position(pts, npts, long, lat=None, s=None):
    """World position at arc length `long` (+ optional right-lateral)."""
    best, seg_start, idxs = _containing_segment(pts, npts, long, s)
    a, b = _oh_pick_pair(pts, best)
    s_b = _oh_pick(seg_start, best, idxs)
    seg = b - a
    seg_len = jnp.sqrt(jnp.maximum((seg ** 2).sum(-1), 1e-12))
    t = jnp.clip((long - s_b) / seg_len, 0.0, None)
    p = a + t[..., None] * seg
    if lat is not None:
        dirv = seg / seg_len[..., None]
        rhs = jnp.stack([dirv[..., 1], -dirv[..., 0]], axis=-1)
        p = p + lat[..., None] * rhs
    return p


def heading_at(pts, npts, long, s=None):
    """Heading (radians) of the segment containing `long`."""
    best, _, _ = _containing_segment(pts, npts, long, s)
    a, b = _oh_pick_pair(pts, best)
    return jnp.arctan2(b[..., 1] - a[..., 1], b[..., 0] - a[..., 0])


def total_length(pts, npts, s=None):
    if s is None:
        s = arc_lengths(pts, npts)
    return s[..., -1]


def _chord_index_frac(P, unpts, spacing, long, total):
    """Containing chord index + interpolation fraction on a fixed-spacing
    path, with the last (short) chord's fraction renormalized against the
    true route total so end-of-route poses land on the recorded endpoint."""
    i = jnp.floor(long / spacing).astype(jnp.int32)
    i = jnp.clip(jnp.minimum(i, unpts - 2), 0, P - 2)
    frac = jnp.clip(long / spacing - i, 0.0, 1.0)
    if total is not None:
        last_i = jnp.maximum(unpts - 2, 0)
        last_span = jnp.maximum(total - last_i.astype(total.dtype) * spacing, 1e-6)
        frac = jnp.where(
            i == last_i,
            jnp.clip((long - i.astype(total.dtype) * spacing) / last_span, 0.0, 1.0),
            frac,
        )
    return i, frac


def uniform_pose(upath, unpts, spacing, long, total=None, scale=None, origin=None):
    """Pose at arc length `long` on a FIXED-SPACING chord path.

    With uniform chords the containing segment is floor(long/spacing) — one
    compare + two one-hot contractions replace the generic polyline
    machinery (arc-length scan + 4 one-hot picks), which profiling showed
    dominating the reactive-traffic step. upath [.., P, 2], unpts [..],
    long [..] -> (pos [.., 2], heading [..]).

    The FINAL chord (built with the end arc clamped to the route total) is
    shorter than `spacing`; pass `total` (the route arc length, [..]) to
    renormalize the interpolation fraction there so end-of-route poses land
    exactly on the recorded endpoint instead of under-advancing by up to one
    chord.
    """
    P = upath.shape[-2]
    i, frac = _chord_index_frac(P, unpts, spacing, long, total)
    ar = jnp.arange(P)
    pts = upath.astype(jnp.float32) if scale is not None else upath
    # both chord endpoints from ONE stacked contraction: separate p0/p1
    # reduces compiled to two fusions that each re-read (and, when
    # quantized, re-converted) the whole [.., P, 2] path from HBM —
    # profiled as the top two fusions of the Waymo-scale scenario step.
    # The mask is ONE broadcast compare (rows i and i+1), not a stack of
    # two masks — a concatenate here materialized the [.., 2, P] bool
    # mask through a layout copy instead of fusing into the contraction
    oh = (i[..., None, None] + jnp.arange(2)[:, None] == ar).astype(
        jnp.float32
    )                                                      # [.., 2, P]
    pp = jnp.einsum("...kp,...pd->...kd", oh, pts)         # [.., 2, 2]
    p0 = pp[..., 0, :]
    p1 = pp[..., 1, :]
    if scale is not None:
        # quantized path: points are int offsets from `origin`. The one-hot
        # sums to 1, so dequantization commutes with the contraction — the
        # reduce reads int16 from HBM and the cheap [.., 2] affine runs after
        p0 = origin + scale * p0
        p1 = origin + scale * p1
    pos = p0 + frac[..., None] * (p1 - p0)
    heading = jnp.arctan2(p1[..., 1] - p0[..., 1], p1[..., 0] - p0[..., 0])
    return pos, heading


def uniform_pose_and_ahead(upath, unpts, spacing, long, total, deltas,
                           scale=None, origin=None):
    """uniform_pose PLUS the chord points at indices i+delta, sharing one
    chord-index/frac computation and one HBM read of the path.

    The probe chain of TrajectoryIDM needs the pose at `long` and 4 points
    spaced ahead along the same fixed-spacing path. Computing each with its
    own uniform_point recomputes the chord index and re-reads the
    (per-env gathered) path from HBM — profiled at ~0.3 ms/step at Waymo
    scale. Here the chord index `i` is computed once and ALL the needed
    rows (i, i+1, and i+delta for each delta, clamped like uniform_point's
    endpoint clamp — rows pad [unpts:] with the endpoint) contract in ONE
    stacked einsum whose mask is a single broadcast compare, so the path
    is read once and no bool mask materializes (see uniform_pose).

    Returns (pos [.., 2], heading [..], [points at i+d for d in deltas]).
    """
    P = upath.shape[-2]
    i, frac = _chord_index_frac(P, unpts, spacing, long, total)
    ar = jnp.arange(P)
    pts = upath.astype(jnp.float32) if scale is not None else upath

    ds = jnp.asarray((0, 1) + tuple(deltas))               # [K]
    j = jnp.clip(
        jnp.minimum(i[..., None] + ds, (unpts - 1)[..., None]), 0, P - 1
    )                                                      # [.., K]
    oh = (j[..., None] == ar).astype(jnp.float32)          # [.., K, P]
    pp = jnp.einsum("...kp,...pd->...kd", oh, pts)         # [.., K, 2]
    if scale is not None:
        pp = origin[..., None, :] + scale * pp
    p0 = pp[..., 0, :]
    p1 = pp[..., 1, :]
    pos = p0 + frac[..., None] * (p1 - p0)
    heading = jnp.arctan2(p1[..., 1] - p0[..., 1], p1[..., 0] - p0[..., 0])
    return pos, heading, [pp[..., 2 + k, :] for k in range(len(deltas))]


def in_band(pts, npts, pos, half_width):
    """Whether pos lies within half_width of the polyline (clamped segment
    distance). The cheap membership test: one distance pass, none of
    local_coordinates' one-hot segment picks — profiling showed those
    multiply-reduce contractions dominating the ScenarioEnv step when the
    lane network is large. pts [..,P,2], pos [..,2], half_width [..]."""
    a = pts[..., :-1, :]
    b = pts[..., 1:, :]
    seg = b - a
    seg_len2 = (seg ** 2).sum(-1)
    idxs = jnp.arange(pts.shape[-2] - 1)
    valid = idxs < (npts[..., None] - 1)
    rel = pos[..., None, :] - a
    t = jnp.clip((rel * seg).sum(-1) / jnp.maximum(seg_len2, 1e-9), 0.0, 1.0)
    proj = a + t[..., None] * seg
    d2 = ((pos[..., None, :] - proj) ** 2).sum(-1)
    return (jnp.where(valid, d2, jnp.inf) <= half_width[..., None] ** 2).any(-1)
