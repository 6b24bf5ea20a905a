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

    IMPORTANT layout quirk: the reference vendors a MODIFIED PyTorch3D
    converter (rotation_conversions.py:527-528) whose on-disk 6d layout is
    INTERLEAVED — ``[r00, r10, r01, r11, r02, r12]`` — and deinterleaves with
    ``[0,2,4] ++ [1,3,5]`` before the Gram-Schmidt step.  The 262-d motion
    format (and every shipped checkpoint/dataset) uses that layout, so it is
    reproduced here.

    Normalisation is eps-stabilised so degenerate all-zero inputs (the output
    of a fresh zero-init denoiser) stay finite; identical to the reference on
    any non-degenerate rotation.
    """
    a1 = d6[..., 0::2]
    a2 = d6[..., 1::2]
    b1 = _safe_normalize(a1)
    b2 = a2 - (b1 * a2).sum(axis=-1, keepdims=True) * b1
    b2 = _safe_normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): the first two rows, INTERLEAVED
    (reference rotation_conversions.py:556-568 — see rotation_6d_to_matrix)."""
    rows = m[..., :2, :]  # (..., 2, 3)
    # [r00, r10, r01, r11, r02, r12] = transpose rows<->cols then flatten.
    return jnp.swapaxes(rows, -1, -2).reshape(m.shape[:-2] + (6,))


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


def _copysign(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(b < 0, -jnp.abs(a), jnp.abs(a))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz, the reference's copysign form
    (rotation_conversions.py:98-120).  w >= 0 always, so downstream
    axis-angle magnitudes land in [0, pi] — representation-exact parity
    (the newer PyTorch3D candidate-select form picks equivalent-but-
    different sign branches)."""
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    o0 = 0.5 * _sqrt_positive_part(1.0 + m00 + m11 + m22)
    x = 0.5 * _sqrt_positive_part(1.0 + m00 - m11 - m22)
    y = 0.5 * _sqrt_positive_part(1.0 - m00 + m11 - m22)
    z = 0.5 * _sqrt_positive_part(1.0 - m00 - m11 + m22)
    o1 = _copysign(x, m[..., 2, 1] - m[..., 1, 2])
    o2 = _copysign(y, m[..., 0, 2] - m[..., 2, 0])
    o3 = _copysign(z, m[..., 1, 0] - m[..., 0, 1])
    return jnp.stack([o0, o1, o2, o3], axis=-1)


def matrix_to_axis_angle(m: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(m))
