"""Batched narrow-phase collision tests.

Replaces Bullet contact/sweep tests (_state_check, base_vehicle.py:700-792;
rect_region_detection, utils/pg/utils.py:213-253) with exact 2D SAT over
fixed-size arrays:

- vehicle OBB vs boundary segments  -> crash_sidewalk / on_*_line flags
- vehicle OBB vs vehicle OBB        -> crash_vehicle

Everything broadcasts; no data-dependent shapes.
"""
import jax.numpy as jnp

from metadrive_ped_tpu.ops.math_ops import heading_vec


def _to_frame(points, center, heading):
    """World points -> OBB-local frame (x along heading)."""
    d = points - center
    c, s = jnp.cos(heading), jnp.sin(heading)
    x = d[..., 0] * c + d[..., 1] * s
    y = -d[..., 0] * s + d[..., 1] * c
    return x, y


def obb_segment_overlap(center, heading, half_len, half_wid, p0, p1, inflate):
    """SAT overlap of an OBB with (possibly thick) segments.

    center [...,2], heading [...], half_len/half_wid [...] broadcast against
    p0/p1 [...,2]; inflate [...] is the segment half-thickness added to the
    box extents. Returns bool of the broadcast batch shape.
    """
    hx = half_len + inflate
    hy = half_wid + inflate
    ax, ay = _to_frame(p0, center, heading)
    bx, by = _to_frame(p1, center, heading)
    # box axes
    overlap_x = (jnp.minimum(ax, bx) <= hx) & (jnp.maximum(ax, bx) >= -hx)
    overlap_y = (jnp.minimum(ay, by) <= hy) & (jnp.maximum(ay, by) >= -hy)
    # segment-normal axis
    dx, dy = bx - ax, by - ay
    seg_len = jnp.sqrt(dx * dx + dy * dy)
    nx = jnp.where(seg_len > 1e-9, -dy / jnp.maximum(seg_len, 1e-9), 1.0)
    ny = jnp.where(seg_len > 1e-9, dx / jnp.maximum(seg_len, 1e-9), 0.0)
    box_radius = hx * jnp.abs(nx) + hy * jnp.abs(ny)
    dist_line = jnp.abs(nx * ax + ny * ay)
    overlap_n = dist_line <= box_radius
    return overlap_x & overlap_y & overlap_n


def vehicle_segment_flags(pos, heading, length, width, seg_p0, seg_p1, seg_type,
                          seg_halfwidth, seg_valid, type_ids):
    """For each type id, whether the vehicle overlaps any segment of that
    type. pos [E,2]; seg_* [E,B,...]; returns dict type_id -> [E] bool."""
    hit = obb_segment_overlap(
        pos[:, None, :], heading[:, None], (length / 2)[:, None], (width / 2)[:, None],
        seg_p0, seg_p1, seg_halfwidth
    ) & seg_valid
    return {t: (hit & (seg_type == t)).any(axis=1) for t in type_ids}


def obb_obb_overlap(c1, h1, len1, wid1, c2, h2, len2, wid2):
    """2D SAT for two OBBs; broadcasts over batch axes."""

    def axes_overlap(ca, ha, la, wa, cb, hb, lb, wb):
        """Project OBB b onto OBB a's two axes."""
        bx, by = _to_frame(cb, ca, ha)
        rel = hb - ha
        cr, sr = jnp.abs(jnp.cos(rel)), jnp.abs(jnp.sin(rel))
        # extent of b projected on a's axes
        ex = (lb / 2) * cr + (wb / 2) * sr
        ey = (lb / 2) * sr + (wb / 2) * cr
        ok_x = jnp.abs(bx) <= (la / 2) + ex
        ok_y = jnp.abs(by) <= (wa / 2) + ey
        return ok_x & ok_y

    return axes_overlap(c1, h1, len1, wid1, c2, h2, len2, wid2) & \
        axes_overlap(c2, h2, len2, wid2, c1, h1, len1, wid1)


def ego_npc_crash(ego_pos, ego_heading, ego_len, ego_wid,
                  npc_pos, npc_heading, npc_len, npc_wid, npc_active):
    """crash_vehicle flag: ego OBB vs any active NPC OBB. npc_* are [E,N]."""
    hit = obb_obb_overlap(
        ego_pos[:, None, :], ego_heading[:, None], ego_len[:, None], ego_wid[:, None],
        npc_pos, npc_heading, npc_len, npc_wid,
    )
    return (hit & npc_active).any(axis=1)
