"""Batched closed-form lane geometry.

The reference computes lane coordinates per Python object
(straight_lane.py:60-74, circular_lane.py:57-121). Here the same closed
forms run as branchless vectorized ops over lane-parameter arrays: every
function broadcasts over arbitrary leading batch axes, and the
straight/circular split is a `jnp.where` select, so the whole thing fuses
into the jit'd step.

The circular `local_coordinates` uses a total (never-raising) version of the
reference's closest-endpoint phase disambiguation (circular_lane.py:71-121):
points in the reference's "undetermined" far region resolve to whichever
endpoint is phase-closer, which agrees with the reference everywhere the
reference is defined.
"""
import jax.numpy as jnp

from metadrive_ped_tpu.constants import LANE_CIRCULAR
from metadrive_ped_tpu.ops.math_ops import wrap_to_pi


def gather_lane(scene, sidx, lid):
    """Gather per-lane geometry params for (env scenario, lane id) pairs.

    sidx: [E] (or [E,1] to broadcast against lid [E,N]); lid: [E] or [E,N].
    Returns a dict of arrays shaped like lid. Implemented as a one-hot
    contraction over the packed lane table (ops/gather.py) — the pointwise
    2D gather this replaces hit TPU's scalar-gather slow path.
    """
    from metadrive_ped_tpu.core import structs as st
    from metadrive_ped_tpu.ops.gather import table_lookup

    sidx = jnp.asarray(sidx)
    lid = jnp.asarray(lid)
    if sidx.ndim > 1:
        sidx = sidx.reshape(sidx.shape[0])
    vals = table_lookup(scene.lane_table, sidx, lid)  # [..., LANE_F]
    toi = lambda x: jnp.round(x).astype(jnp.int32)
    return dict(
        kind=toi(vals[..., st.LANE_KIND]),
        p0=vals[..., st.LANE_P0X:st.LANE_P0Y + 1],
        dirv=vals[..., st.LANE_DIRX:st.LANE_DIRY + 1],
        radius=jnp.maximum(vals[..., st.LANE_RADIUS], 1e-6),  # guard /0 on padded rows
        start_phase=vals[..., st.LANE_START_PHASE],
        arc_dir=vals[..., st.LANE_ARC_DIR],
        width=vals[..., st.LANE_WIDTH],
        length=vals[..., st.LANE_LENGTH],
        angle=vals[..., st.LANE_ANGLE],
        road=toi(vals[..., st.LANE_ROAD]),
        idx_in_road=toi(vals[..., st.LANE_IDX_IN_ROAD]),
        succ=toi(vals[..., st.LANE_SUCC]),
        left=toi(vals[..., st.LANE_LEFT]),
        right=toi(vals[..., st.LANE_RIGHT]),
        valid=vals[..., st.LANE_VALID] > 0.5,
        speed_limit=vals[..., st.LANE_SPEED_LIMIT],
        block=toi(vals[..., st.LANE_BLOCK]),
    )


def gather_lane_with_neighbors(scene, sidx, lid):
    """gather_lane PLUS the left/right neighbor lanes' gap-search geometry
    (and their successor ids), all from ONE one-hot contraction over the
    prejoined ``lane_nbr_table`` (core/structs.py).

    The IDM step needs self+left+right lane rows for every NPC every step;
    looking each up separately built five [.., S*L] one-hot masks — the
    profiled top cost of the PG step at 8192 envs. Returns
    (g, g_left, g_right); the neighbor dicts carry kind/p0/dirv/radius/
    start_phase/arc_dir/width/length/angle/succ (zeros and succ=-1 where
    the neighbor does not exist — mask with g["left"] >= 0 etc.).
    """
    from metadrive_ped_tpu.core import structs as st
    from metadrive_ped_tpu.ops.gather import table_lookup

    sidx = jnp.asarray(sidx)
    lid = jnp.asarray(lid)
    if sidx.ndim > 1:
        sidx = sidx.reshape(sidx.shape[0])
    vals = table_lookup(scene.lane_nbr_table, sidx, lid)
    toi = lambda x: jnp.round(x).astype(jnp.int32)
    g = dict(
        kind=toi(vals[..., st.LANE_KIND]),
        p0=vals[..., st.LANE_P0X:st.LANE_P0Y + 1],
        dirv=vals[..., st.LANE_DIRX:st.LANE_DIRY + 1],
        radius=jnp.maximum(vals[..., st.LANE_RADIUS], 1e-6),
        start_phase=vals[..., st.LANE_START_PHASE],
        arc_dir=vals[..., st.LANE_ARC_DIR],
        width=vals[..., st.LANE_WIDTH],
        length=vals[..., st.LANE_LENGTH],
        angle=vals[..., st.LANE_ANGLE],
        road=toi(vals[..., st.LANE_ROAD]),
        idx_in_road=toi(vals[..., st.LANE_IDX_IN_ROAD]),
        succ=toi(vals[..., st.LANE_SUCC]),
        left=toi(vals[..., st.LANE_LEFT]),
        right=toi(vals[..., st.LANE_RIGHT]),
        valid=vals[..., st.LANE_VALID] > 0.5,
        speed_limit=vals[..., st.LANE_SPEED_LIMIT],
        block=toi(vals[..., st.LANE_BLOCK]),
    )

    def nbr(off):
        v = vals[..., off:off + st.NBR_F]
        return dict(
            kind=toi(v[..., 0]),
            p0=v[..., 1:3],
            dirv=v[..., 3:5],
            radius=jnp.maximum(v[..., 5], 1e-6),
            start_phase=v[..., 6],
            arc_dir=v[..., 7],
            width=v[..., 8],
            length=v[..., 9],
            angle=v[..., 10],
            succ=toi(v[..., 11]),
        )

    return g, nbr(st.LANE_F), nbr(st.LANE_F + st.NBR_F)


def gather_road(scene, sidx, rid):
    """Per-road fields via one-hot lookup: dict(lane0, nlanes, negative, succ)."""
    from metadrive_ped_tpu.core import structs as st
    from metadrive_ped_tpu.ops.gather import table_lookup

    sidx = jnp.asarray(sidx)
    if sidx.ndim > 1:
        sidx = sidx.reshape(sidx.shape[0])
    vals = table_lookup(scene.road_table, sidx, jnp.asarray(rid))
    toi = lambda x: jnp.round(x).astype(jnp.int32)
    return dict(
        lane0=toi(vals[..., st.ROAD_LANE0]),
        nlanes=toi(vals[..., st.ROAD_NLANES]),
        negative=vals[..., st.ROAD_NEGATIVE] > 0.5,
        succ=toi(vals[..., st.ROAD_SUCC]),
    )


def gather_all_lanes(scene, sidx):
    """Per-env rows of EVERY lane's params: each field [E, L(, 2)].

    Row-gather on the scenario axis only — on TPU this lowers to an
    efficient take along axis 0, unlike the pointwise 2D gather of
    gather_lane with a full arange of lane ids (which hit XLA's slow
    scalar-gather path and dominated the step time).
    """
    take = lambda a: a[sidx]
    return dict(
        kind=take(scene.lane_kind),
        p0=take(scene.lane_p0),
        dirv=take(scene.lane_dir),
        radius=jnp.maximum(take(scene.lane_radius), 1e-6),
        start_phase=take(scene.lane_start_phase),
        arc_dir=take(scene.lane_arc_dir),
        width=take(scene.lane_width),
        length=take(scene.lane_length),
        angle=take(scene.lane_angle),
    )


def local_coordinates(g, pos):
    """(longitudinal, lateral) of world points in lanes ``g``.

    g: dict from gather_lane with batch shape B; pos: [..., 2] broadcastable.
    """
    delta = pos - g["p0"]  # straight: rel start; circular: rel center
    # straight (straight_lane.py:69-74)
    long_s = delta[..., 0] * g["dirv"][..., 0] + delta[..., 1] * g["dirv"][..., 1]
    lat_s = delta[..., 0] * g["dirv"][..., 1] - delta[..., 1] * g["dirv"][..., 0]
    # circular (circular_lane.py:71-121), branchless
    abs_phase = wrap_to_pi(jnp.arctan2(delta[..., 1], delta[..., 0]))
    start_phase = wrap_to_pi(g["start_phase"])
    end_phase = wrap_to_pi(g["start_phase"] + g["arc_dir"] * g["angle"])
    d_start = jnp.abs(wrap_to_pi(abs_phase - start_phase))
    d_end = jnp.abs(wrap_to_pi(abs_phase - end_phase))
    long_from_start = wrap_to_pi(g["arc_dir"] * (abs_phase - start_phase)) * g["radius"]
    long_from_end = wrap_to_pi(g["arc_dir"] * (abs_phase - end_phase)) * g["radius"] + g["length"]
    long_c = jnp.where(d_start > d_end, long_from_end, long_from_start)
    dist = jnp.sqrt(delta[..., 0] ** 2 + delta[..., 1] ** 2)
    lat_c = g["arc_dir"] * (dist - g["radius"])

    is_circ = g["kind"] == LANE_CIRCULAR
    return jnp.where(is_circ, long_c, long_s), jnp.where(is_circ, lat_c, lat_s)


def position(g, longitudinal, lateral):
    """World position of lane-local coordinates (straight_lane.py:60-61,
    circular_lane.py:57-62)."""
    pos_s = (
        g["p0"]
        + longitudinal[..., None] * g["dirv"]
        + lateral[..., None] * jnp.stack([g["dirv"][..., 1], -g["dirv"][..., 0]], axis=-1)
    )
    phi = g["arc_dir"] * longitudinal / g["radius"] + g["start_phase"]
    r = g["radius"] + lateral * g["arc_dir"]
    pos_c = g["p0"] + r[..., None] * jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)
    return jnp.where((g["kind"] == LANE_CIRCULAR)[..., None], pos_c, pos_s)


def heading_theta_at(g, longitudinal):
    """Lane heading at a longitudinal position (straight_lane.py:63-64,
    circular_lane.py:64-67)."""
    head_s = jnp.arctan2(g["dirv"][..., 1], g["dirv"][..., 0])
    phi = g["arc_dir"] * longitudinal / g["radius"] + g["start_phase"]
    head_c = phi + 0.5 * jnp.pi * g["arc_dir"]
    return jnp.where(g["kind"] == LANE_CIRCULAR, head_c, head_s)


def on_lane(g, longitudinal, lateral, margin=0.0):
    """Point-in-lane-polygon equivalent (abs_lane.py point_on_lane)."""
    return (
        (longitudinal >= -margin)
        & (longitudinal <= g["length"] + margin)
        & (jnp.abs(lateral) <= g["width"] / 2 + margin)
    )


def l1_distance(g, longitudinal, lateral):
    """L1 lane distance used for closest-lane ranking
    (reference GraphLookupTable.get, node_road_network.py:19-65)."""
    over = jnp.maximum(longitudinal - g["length"], 0.0) + jnp.maximum(-longitudinal, 0.0)
    return jnp.abs(lateral) + over
