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

    sidx and lid broadcast; returns a dict of arrays with that shape.
    """
    take = lambda a: a[sidx, lid]
    return dict(
        kind=take(scene.lane_kind),
        p0=scene.lane_p0[sidx, lid],
        dirv=scene.lane_dir[sidx, lid],
        radius=take(scene.lane_radius),
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
