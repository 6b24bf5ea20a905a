"""Rotation-representation conversions (6d / matrix / axis-angle / quaternion).

Pure-jnp re-implementation of the PyTorch3D-style converters the reference
vendors (parity source ``/root/reference/src/utils/rotation_conversions.py``:
``rotation_6d_to_matrix``:513, ``matrix_to_rotation_6d``:541,
``axis_angle_to_matrix``:418, ``matrix_to_axis_angle``:430,
``matrix_to_quaternion``:107, ``quaternion_to_axis_angle``:489).
Quaternions are (w, x, y, z).
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v * jax_rsqrt((v * v).sum(axis=-1, keepdims=True) + eps)


def jax_rsqrt(x):
    import jax.lax

    return jax.lax.rsqrt(x)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) continuous 6d rep -> (..., 3, 3) via Gram-Schmidt.

    Normalisation is eps-stabilised so degenerate all-zero inputs (the output
    of a fresh zero-init denoiser) stay finite; identical to the reference on
    any non-degenerate rotation.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = _safe_normalize(a1)
    b2 = a2 - (b1 * a2).sum(axis=-1, keepdims=True) * b1
    b2 = _safe_normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): the first two rows, flattened."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    # eps inside the sqrt: finite gradient at the zero rotation.
    angles = jnp.sqrt((axis_angle**2).sum(axis=-1, keepdims=True) + 1e-24)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x, with the small-angle Taylor expansion 1/2 - x^2/48.
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    # eps inside the sqrt keeps the gradient finite at the identity rotation
    # (xyz == 0), which real motion data hits constantly.
    norms = jnp.sqrt((q[..., 1:] ** 2).sum(axis=-1, keepdims=True) + 1e-24)
    half_angles = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return q[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    from .quaternions import quaternion_to_matrix

    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    # max(x, 0) + tiny eps: finite gradient at x == 0 (non-selected quaternion
    # candidates hit this for every axis-aligned rotation).
    return jnp.sqrt(jnp.maximum(x, 0.0) + 1e-24)


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4), numerically stable candidate-selection form."""
    batch = m.shape[:-2]
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = jnp.stack(
        [
            _sqrt_positive_part(1.0 + m00 + m11 + m22),
            _sqrt_positive_part(1.0 + m00 - m11 - m22),
            _sqrt_positive_part(1.0 - m00 + m11 - m22),
            _sqrt_positive_part(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = jnp.asarray(0.1, dtype=m.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax_one_hot(best, 4, dtype=m.dtype)
    out = (quat_candidates * onehot[..., None]).sum(axis=-2)
    return out.reshape(batch + (4,))


def jax_one_hot(idx: jnp.ndarray, n: int, dtype=jnp.float32) -> jnp.ndarray:
    return (idx[..., None] == jnp.arange(n)).astype(dtype)


def matrix_to_axis_angle(m: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(m))
