"""Small batched math helpers (VPU elementwise)."""
import jax.numpy as jnp


def wrap_to_pi(x):
    """Wrap radians to (-pi, pi] (reference: metadrive/utils/math.py:29-41)."""
    x = x % (2.0 * jnp.pi)
    return x - 2.0 * jnp.pi * (x > jnp.pi)


def clip01(x):
    return jnp.clip(x, 0.0, 1.0)


def heading_vec(theta):
    """Unit heading vector(s); stacks on the last axis."""
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def rhs_vec(theta):
    """Right-hand-side unit vector of a heading (x-forward frame where the
    right-hand perpendicular of (dx,dy) is (dy,-dx) — matches the reference's
    direction_lateral convention, straight_lane.py:46)."""
    return jnp.stack([jnp.sin(theta), -jnp.cos(theta)], axis=-1)


def norm2(v, axis=-1):
    return jnp.sqrt(jnp.sum(v * v, axis=axis))
