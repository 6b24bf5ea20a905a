"""Quaternion math as pure jnp functions (w, x, y, z convention).

Functional re-design of the torch quaternion library the reference vendors
(parity source ``/root/reference/src/utils/quaternion.py``: ``qinv``:16,
``qnormalize``:28, ``qmul``:33, ``qrot``:54, ``qbetween``:386).  Everything
here is shape-polymorphic over leading batch dims and safe to use inside
``jit`` / ``vmap`` / ``lax.scan``.
"""

from __future__ import annotations

import jax.numpy as jnp


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of unit quaternion(s), shape (..., 4)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*r for (..., 4) tensors."""
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    rw, rx, ry, rz = jnp.moveaxis(r, -1, 0)
    return jnp.stack(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=-1,
    )


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4).

    Uses the 2-cross-product form, matching reference ``qrot``
    (quaternion.py:54-74) bit-for-bit in f32.
    """
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qbetween(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating v0 onto v1 (reference quaternion.py:386-397).

    The ``+ 1e-8`` stabiliser on the scalar part matches the reference and
    keeps the antiparallel case finite (though degenerate, as upstream).
    """
    v = jnp.cross(v0, v1)
    # eps inside the sqrt keeps the gradient finite for zero-length inputs
    # (value matches the reference to float precision on real data).
    w = (
        jnp.sqrt(
            (v0**2).sum(axis=-1, keepdims=True)
            * (v1**2).sum(axis=-1, keepdims=True)
            + 1e-24
        )
        + (v0 * v1).sum(axis=-1, keepdims=True)
        + 1e-8
    )
    return qnormalize(jnp.concatenate([w, v], axis=-1))


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) unit quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / (q * q).sum(axis=-1)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))
