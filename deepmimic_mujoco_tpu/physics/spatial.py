"""Spatial (6D) vector algebra in the world-aligned com frame.

Vectors are ordered [angular(3); linear(3)] (engine convention for
cvel/cdof/cacc). All functions are jnp, branchless, and broadcast over
leading batch dimensions.
"""
import jax
import jax.numpy as jnp


def motion_cross(v, m):
    """Motion x motion: time derivative of a motion vector m seen from
    a frame moving with spatial velocity v."""
    vw, vv = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(vw, mw), jnp.cross(vw, mv) + jnp.cross(vv, mw)], axis=-1)


def force_cross(v, f):
    """Motion x* force: bias force of momentum f under velocity v."""
    vw, vv = v[..., :3], v[..., 3:]
    fw, fv = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(vw, fw) + jnp.cross(vv, fv), jnp.cross(vw, fv)], axis=-1)


def inertia_matrix(mass, inertia_com, r):
    """6x6 spatial inertia about a point o, [w; v] ordering.

    mass: (...,), inertia_com: (..., 3, 3) world-aligned rotational
    inertia about the body com, r: (..., 3) = com - o.
    Maps [w; v_o] -> [L_o; p].
    """
    rx = skew(r)
    m = mass[..., None, None]
    # HIGHEST: default TPU matmul rounds inputs to bf16 (see
    # physics/step.py:_hi_matmul); 3x3, so exactness is free.
    top_left = inertia_com - m * jnp.matmul(
        rx, rx, precision=jax.lax.Precision.HIGHEST)
    top_right = m * rx
    bottom_left = -m * rx
    eye = jnp.broadcast_to(jnp.eye(3, dtype=inertia_com.dtype), rx.shape)
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def skew(r):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))
