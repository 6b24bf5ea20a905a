"""Unit tests for the geometry substrate (quaternions, rotations, alignment)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.utils import quaternions as Q
from mixermdm_tpu.utils import rotations as R
from mixermdm_tpu.utils import alignment as A


def random_quats(rng, shape):
    q = rng.standard_normal(shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternions:
    def test_qmul_identity(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(random_quats(rng, (5,)), jnp.float32)
        ident = jnp.asarray([1.0, 0, 0, 0]) * jnp.ones((5, 1))
        np.testing.assert_allclose(Q.qmul(q, ident), q, atol=1e-6)
        np.testing.assert_allclose(Q.qmul(ident, q), q, atol=1e-6)

    def test_qrot_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(random_quats(rng, (7,)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((7, 3)), jnp.float32)
        m = Q.quaternion_to_matrix(q)
        np.testing.assert_allclose(
            Q.qrot(q, v), jnp.einsum("bij,bj->bi", m, v), atol=1e-5
        )

    def test_qrot_inverse(self):
        rng = np.random.default_rng(2)
        q = jnp.asarray(random_quats(rng, (4,)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
        np.testing.assert_allclose(Q.qrot(Q.qinv(q), Q.qrot(q, v)), v, atol=1e-5)

    def test_qbetween_rotates_v0_to_v1(self):
        rng = np.random.default_rng(3)
        v0 = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
        v1 = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
        q = Q.qbetween(v0, v1)
        r = Q.qrot(q, v0)
        # Direction must match (magnitudes preserved by rotation).
        r_dir = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        v1_dir = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
        np.testing.assert_allclose(r_dir, v1_dir, atol=1e-4)


class TestRotations:
    def test_6d_matrix_roundtrip(self):
        rng = np.random.default_rng(4)
        q = jnp.asarray(random_quats(rng, (10,)), jnp.float32)
        m = Q.quaternion_to_matrix(q)
        d6 = R.matrix_to_rotation_6d(m)
        m2 = R.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_axis_angle_matrix_roundtrip(self):
        rng = np.random.default_rng(5)
        aa = jnp.asarray(rng.standard_normal((10, 3)) * 0.8, jnp.float32)
        m = R.axis_angle_to_matrix(aa)
        aa2 = R.matrix_to_axis_angle(m)
        np.testing.assert_allclose(aa, aa2, atol=1e-4)

    def test_matrix_orthonormal(self):
        rng = np.random.default_rng(6)
        d6 = jnp.asarray(rng.standard_normal((8, 6)), jnp.float32)
        m = R.rotation_6d_to_matrix(d6)
        eye = jnp.eye(3)[None].repeat(8, 0)
        np.testing.assert_allclose(m @ jnp.swapaxes(m, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(m), jnp.ones(8), atol=1e-5)

    def test_small_angle_stability(self):
        aa = jnp.asarray([[1e-8, 0, 0], [0, 0, 0]], jnp.float32)
        m = R.axis_angle_to_matrix(aa)
        assert bool(jnp.isfinite(m).all())
        aa2 = R.matrix_to_axis_angle(m)
        assert bool(jnp.isfinite(aa2).all())


def make_motion(rng, B=2, T=16):
    """Synthetic IH-format motion with a plausible skeleton layout."""
    base = rng.standard_normal((B, 1, 22, 3)) * 0.1
    walk = np.linspace(0, 1, T)[None, :, None, None] * np.array([1.0, 0, 0.5])
    pos = base + walk + rng.standard_normal((B, T, 22, 3)) * 0.02
    pos[..., 1] += 1.0  # above floor
    vel = np.diff(np.concatenate([pos[:, :1], pos], axis=1), axis=1)
    rot = random_quats(rng, (B, T, 21))
    rot6d = np.asarray(R.matrix_to_rotation_6d(Q.quaternion_to_matrix(jnp.asarray(rot, jnp.float32))))
    contacts = (rng.random((B, T, 4)) > 0.5).astype(np.float32)
    return jnp.asarray(
        np.concatenate(
            [pos.reshape(B, T, 66), vel.reshape(B, T, 66), rot6d.reshape(B, T, 126), contacts],
            axis=-1,
        ),
        jnp.float32,
    )


class TestAlignment:
    def test_ih_smpl_roundtrip_preserves_pos_vel(self):
        rng = np.random.default_rng(7)
        m = make_motion(rng)
        smpl = A.ih_to_smpl(m)
        assert smpl.shape[-1] == 205
        back = A.smpl_to_ih(smpl)
        assert back.shape[-1] == 262
        np.testing.assert_allclose(back[..., :132], m[..., :132], atol=1e-5)
        np.testing.assert_allclose(back[..., -4:], m[..., -4:], atol=1e-6)
        # Rotations survive the 6d -> axis-angle -> 6d round trip.
        np.testing.assert_allclose(back[..., 132:258], m[..., 132:258], atol=1e-3)

    def test_center_motion_canonicalises(self):
        rng = np.random.default_rng(8)
        m = A.ih_to_smpl(make_motion(rng))
        c = A.center_motion(m)
        assert c.shape[-1] == 201
        pos = c[..., :66].reshape(c.shape[0], c.shape[1], 22, 3)
        # Root XZ at origin in frame 0.
        np.testing.assert_allclose(pos[:, 0, 0, 0], 0.0, atol=1e-5)
        np.testing.assert_allclose(pos[:, 0, 0, 2], 0.0, atol=1e-5)
        # Floor at zero.
        np.testing.assert_allclose(pos[..., 1].min(axis=(1, 2)), 0.0, atol=1e-5)
        # Idempotent-ish: re-centering changes nothing.
        c2 = A.center_motion(c)
        np.testing.assert_allclose(c, c2, atol=1e-4)

    def test_align_motions_matches_start_roots(self):
        rng = np.random.default_rng(9)
        m1 = A.ih_to_smpl(make_motion(rng))
        m2 = A.ih_to_smpl(make_motion(rng))
        _, m2a = A.align_motions(m1, m2)
        p1 = m1[..., :66].reshape(m1.shape[0], -1, 22, 3)
        p2 = m2a[..., :66].reshape(m2a.shape[0], -1, 22, 3)
        np.testing.assert_allclose(p1[:, 0, 0], p2[:, 0, 0], atol=1e-4)

    def test_alignment_jit_and_vmap_safe(self):
        rng = np.random.default_rng(10)
        m = make_motion(rng)
        f = jax.jit(lambda x: A.smpl_to_ih(A.center_motion(A.ih_to_smpl(x))))
        out = f(m)
        assert out.shape == m.shape
        assert bool(jnp.isfinite(out).all())


class TestFastGeometryEquivalence:
    """The fast algebraic paths must match the reference-faithful chains."""

    def test_center_person_fast(self):
        from mixermdm_tpu.utils.alignment import center_person_fast

        rng = np.random.default_rng(11)
        m = make_motion(rng, B=3, T=10)
        slow = A.smpl_to_ih(A.center_motion(A.ih_to_smpl(m)))
        fast = center_person_fast(m)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=5e-4)

    def test_align_persons_fast(self):
        from mixermdm_tpu.utils.alignment import align_persons_fast

        rng = np.random.default_rng(12)
        ref = make_motion(rng, B=2, T=10)
        mov = make_motion(rng, B=2, T=10)
        o_ref = A.ih_to_smpl(ref)
        o_mov = A.ih_to_smpl(mov)
        _, aligned = A.align_motions(o_ref, o_mov)
        slow_mov = A.smpl_to_ih(aligned)
        slow_ref = A.smpl_to_ih(o_ref)
        fast_ref, fast_mov = align_persons_fast(ref, mov)
        np.testing.assert_allclose(np.asarray(fast_mov), np.asarray(slow_mov), atol=2e-4)
        np.testing.assert_allclose(np.asarray(fast_ref), np.asarray(slow_ref), atol=2e-4)

    def test_align_persons_fast_with_mask(self):
        from mixermdm_tpu.utils.alignment import align_persons_fast

        rng = np.random.default_rng(13)
        ref = make_motion(rng, B=2, T=10)
        mov = make_motion(rng, B=2, T=10)
        mask = jnp.ones((2, 10, 1)).at[0, 7:].set(0.0)
        o_ref, o_mov = A.ih_to_smpl(ref), A.ih_to_smpl(mov)
        _, aligned = A.align_motions(o_ref, o_mov, mask)
        slow_mov = A.smpl_to_ih(aligned)
        _, fast_mov = align_persons_fast(ref, mov, mask)
        np.testing.assert_allclose(np.asarray(fast_mov), np.asarray(slow_mov), atol=2e-4)
