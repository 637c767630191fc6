"""Batched lidar raycasting.

Replaces the per-ray Bullet rayTestClosest loop
(component/sensors/distance_detector.py:27-85 + lidar.py:49-73; the Cython
twin lives in metadrive/cutils.pyx) with one vectorized ray-vs-OBB slab test
over [E, num_rays, num_targets]. Output matches the reference cloud: hit
fraction in [0,1] per ray, 1.0 when nothing is hit within `distance`.

Ray i leaves at angle heading + 2*pi*i/N (distance_detector perceive fans
the full circle starting at the vehicle head).
"""
import jax.numpy as jnp


def _fan_dirs(heading, num_rays, offset=0.0):
    """Unit directions of the ray fan heading + offset + 2*pi*i/N, via the
    angle-addition identity: TWO transcendentals per env (cos/sin of the
    heading) against constant fan tables, instead of two per RAY — the
    [E,R] cos/sin pair was a visible slice of the lidar fusions at 8192
    envs x 240 rays."""
    i = jnp.arange(num_rays, dtype=jnp.float32)
    phi = offset + (2.0 * jnp.pi / num_rays) * i
    cphi, sphi = jnp.cos(phi)[None, :], jnp.sin(phi)[None, :]  # constants
    ch, sh = jnp.cos(heading)[:, None], jnp.sin(heading)[:, None]
    return ch * cphi - sh * sphi, sh * cphi + ch * sphi


def ray_obb_fraction(origin, angles, max_dist, obb_c, obb_h, obb_len, obb_wid, obb_active,
                     dirs=None):
    """Min hit fraction of each ray against a set of OBBs.

    origin [E,2]; angles [E,R] (or precomputed unit ``dirs``); obb_* [E,N];
    returns [E,R] in [0,1].
    """
    dx0, dy0 = dirs if dirs is not None else (jnp.cos(angles), jnp.sin(angles))
    dirx = dx0[:, :, None]                       # [E,R,1]
    diry = dy0[:, :, None]
    # transform ray into each OBB frame
    c, s = jnp.cos(obb_h)[:, None, :], jnp.sin(obb_h)[:, None, :]  # [E,1,N]
    relx = origin[:, 0][:, None, None] - obb_c[..., 0][:, None, :]
    rely = origin[:, 1][:, None, None] - obb_c[..., 1][:, None, :]
    ox = relx * c + rely * s                     # [E,R,N]
    oy = -relx * s + rely * c
    dx = dirx * c + diry * s
    dy = -dirx * s + diry * c

    hx = (obb_len / 2)[:, None, :]
    hy = (obb_wid / 2)[:, None, :]

    # slab method, branchless
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-9, 1e-9, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
    tx1, tx2 = (-hx - ox) * inv_dx, (hx - ox) * inv_dx
    ty1, ty2 = (-hy - oy) * inv_dy, (hy - oy) * inv_dy
    tmin = jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2))
    tmax = jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2))
    hit = (tmax >= tmin) & (tmax >= 0) & obb_active[:, None, :]
    t = jnp.where(tmin >= 0, tmin, tmax)  # origin inside -> exit point
    frac = jnp.where(hit, jnp.clip(t / max_dist, 0.0, 1.0), 1.0)
    return frac.min(axis=2)


def ray_circle_fraction(origin, angles, max_dist, c, r, active, dirs=None):
    """Min hit fraction of rays against circles (the reference's cylinder
    bodies: pedestrians r=0.35 pedestrian.py:12-118, cones r=0.2 /
    warnings r=0.5 traffic_object.py:43-160).

    origin [E,2]; angles [E,R] (or precomputed unit ``dirs``); c [E,N,2];
    r [E,N]; active [E,N] -> [E,R].
    """
    dx0, dy0 = dirs if dirs is not None else (jnp.cos(angles), jnp.sin(angles))
    dirx = dx0[:, :, None]                           # [E,R,1]
    diry = dy0[:, :, None]
    relx = c[..., 0][:, None, :] - origin[:, 0][:, None, None]   # [E,R,N]
    rely = c[..., 1][:, None, :] - origin[:, 1][:, None, None]
    # |o + t d - c|^2 = r^2 with |d| = 1: t^2 - 2 b t + (|rel|^2 - r^2) = 0
    b = relx * dirx + rely * diry
    disc = b * b - (relx * relx + rely * rely - (r * r)[:, None, :])
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_in, t_out = b - root, b + root
    t = jnp.where(t_in >= 0, t_in, t_out)  # origin inside -> exit point
    hit = (disc >= 0) & (t_out >= 0) & active[:, None, :]
    frac = jnp.where(hit, jnp.clip(t / max_dist, 0.0, 1.0), 1.0)
    return frac.min(axis=2)


def lidar_cloud(ego_pos, ego_heading, num_rays, max_dist,
                npc_pos, npc_heading, npc_len, npc_wid, npc_active,
                radius=None, circle_slice=None):
    """The 240-point lidar cloud (lidar.py:16-73): fraction of `max_dist`
    to the nearest body along each of `num_rays` fanned rays.

    ``radius`` [E,N] (optional) marks cylinder bodies: rows with
    radius > 0 ray-cast as circles of that radius (the reference's
    pedestrian/cone/warning cylinders); rows with radius <= 0 stay OBBs.
    ``circle_slice`` optionally bounds the target range that can hold
    cylinders (the obj+ped slots of _lidar_targets), so the circle pass
    skips the vehicle axis entirely."""
    dirs = _fan_dirs(ego_heading, num_rays)
    if radius is None:
        return ray_obb_fraction(
            ego_pos, None, max_dist, npc_pos, npc_heading, npc_len,
            npc_wid, npc_active, dirs=dirs,
        )
    circ = radius > 0
    box_frac = ray_obb_fraction(
        ego_pos, None, max_dist, npc_pos, npc_heading, npc_len, npc_wid,
        npc_active & ~circ, dirs=dirs,
    )
    sl = circle_slice if circle_slice is not None else slice(None)
    circ_frac = ray_circle_fraction(
        ego_pos, None, max_dist, npc_pos[:, sl], radius[:, sl],
        (npc_active & circ)[:, sl], dirs=dirs,
    )
    return jnp.minimum(box_frac, circ_frac)


def ray_segment_fraction(origin, angles, max_dist, p0, p1, valid, dirs=None):
    """Min hit fraction of rays against 2D segments (the side/lane-line
    detectors' rayTestClosest vs lane-line ghosts,
    distance_detector.py:27-85 + SideDetector :194).

    origin [E,2]; angles [E,R] (or precomputed unit ``dirs``);
    p0/p1 [E,B,2]; valid [E,B] -> [E,R].
    """
    dx0, dy0 = dirs if dirs is not None else (jnp.cos(angles), jnp.sin(angles))
    dx = dx0[:, :, None]              # [E,R,1]
    dy = dy0[:, :, None]
    ax = p0[..., 0][:, None, :]       # [E,1,B]
    ay = p0[..., 1][:, None, :]
    sx = (p1[..., 0] - p0[..., 0])[:, None, :]
    sy = (p1[..., 1] - p0[..., 1])[:, None, :]
    ox = origin[:, 0][:, None, None]
    oy = origin[:, 1][:, None, None]
    # solve o + t*d = a + u*s
    denom = dx * sy - dy * sx
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    rel_x = ax - ox
    rel_y = ay - oy
    t = (rel_x * sy - rel_y * sx) / denom
    u = (rel_x * dy - rel_y * dx) / denom
    hit = (t >= 0) & (u >= 0) & (u <= 1) & valid[:, None, :]
    frac = jnp.where(hit, jnp.clip(t / max_dist, 0.0, 1.0), 1.0)
    return frac.min(axis=2)


def side_detector_cloud(ego_pos, ego_heading, num_rays, max_dist, p0, p1, valid):
    """SideDetector: rays offset 90 deg fanned over the circle
    (distance_detector.py:118-160 side variant)."""
    dirs = _fan_dirs(ego_heading, num_rays, offset=jnp.pi / 2)
    return ray_segment_fraction(ego_pos, None, max_dist, p0, p1, valid,
                                dirs=dirs)
