"""Tests for VLB, guidance, samplers, and skeleton FK/IK."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.diffusion import gaussian as G
from mixermdm_tpu.diffusion import guidance as GD
from mixermdm_tpu.diffusion import samplers as SMP
from mixermdm_tpu.diffusion import vlb as V
from mixermdm_tpu.diffusion.schedule import cosine_betas, make_schedule


def sched(n=20):
    return make_schedule(cosine_betas(n))


class TestVLB:
    def test_normal_kl_zero(self):
        m = jnp.asarray([1.0, -2.0])
        lv = jnp.asarray([0.3, -0.1])
        np.testing.assert_allclose(np.asarray(V.normal_kl(m, lv, m, lv)), 0.0, atol=1e-7)

    def test_normal_kl_analytic(self):
        # KL(N(0,1) || N(1,1)) = 0.5
        kl = V.normal_kl(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.0))
        assert abs(float(kl) - 0.5) < 1e-6

    def test_discretized_ll_peak(self):
        x = jnp.zeros((2, 3))
        ll_good = V.discretized_gaussian_log_likelihood(x, x, jnp.full_like(x, -5.0))
        ll_bad = V.discretized_gaussian_log_likelihood(x, x + 0.5, jnp.full_like(x, -5.0))
        assert float(ll_good.mean()) > float(ll_bad.mean())

    def test_bpd_loop_oracle(self):
        s = sched(10)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3)) * 0.1

        def oracle(x_t, t_orig):
            return x0

        out = V.calc_bpd_loop(oracle, s, x0, jax.random.PRNGKey(1))
        assert out["vb"].shape == (2, 10)
        assert bool(jnp.isfinite(out["total_bpd"]).all())
        # Oracle x0 prediction => tiny xstart mse.
        np.testing.assert_allclose(np.asarray(out["xstart_mse"]), 0.0, atol=1e-8)


class TestGuidance:
    def test_ddim_reverse_inverts_forward(self):
        """encode(decode(x_T)) should approximately return x_T for an oracle."""
        s = sched(50)
        x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2)) * 0.3

        def oracle(x, t_orig):
            return x0

        x_T = GD.ddim_encode_loop(oracle, s, x0)
        assert bool(jnp.isfinite(x_T).all())
        # Decoding that latent with eta=0 must return x0.
        out = G.ddim_sample_loop(oracle, s, x0.shape, jax.random.PRNGKey(3), noise=x_T)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)

    def test_condition_mean_shifts(self):
        s = sched(10)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 2))
        t = jnp.asarray([5, 5])
        p_out = {
            "mean": jnp.zeros_like(x),
            "variance": jnp.ones_like(x) * 0.1,
            "log_variance": jnp.log(jnp.ones_like(x) * 0.1),
            "pred_xstart": jnp.zeros_like(x),
        }
        new_mean = GD.condition_mean(lambda xx, tt: jnp.ones_like(xx), s, p_out, x, t)
        np.testing.assert_allclose(np.asarray(new_mean), 0.1, atol=1e-6)

    def test_prefix_inpainting(self):
        s = sched(10)
        x = jnp.zeros((2, 8, 4))
        pre = jnp.ones((2, 3, 4))
        t = jnp.asarray([0, 0])  # t=0: q_sample returns ~the prefix itself
        out = GD.apply_prefix_inpainting(s, x, t, pre, jax.random.PRNGKey(5))
        assert abs(float(out[:, :3].mean()) - float(s.sqrt_alphas_cumprod[0])) < 0.2
        np.testing.assert_allclose(np.asarray(out[:, 3:]), 0.0)

    def test_warm_start(self):
        s = sched(10)
        init = jnp.ones((2, 4, 3))
        out = GD.warm_start_noise(s, init, jax.random.PRNGKey(6), init.shape, skip_timesteps=8)
        # At t=1 most signal survives.
        assert float(out.mean()) > 0.5


class TestSamplers:
    def test_uniform(self):
        t, w = SMP.uniform_sample(jax.random.PRNGKey(0), 1000, 50)
        assert t.shape == (1000,) and (t >= 0).all() and (t < 50).all()
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_loss_aware_warmup_uniform(self):
        state = SMP.loss_aware_init(10, history_size=4)
        w = SMP.loss_aware_weights(state)
        np.testing.assert_allclose(np.asarray(w), 0.1, atol=1e-6)

    def test_loss_aware_update_and_bias(self):
        state = SMP.loss_aware_init(4, history_size=2)
        # Fill history: timestep 3 has much larger losses.
        for _ in range(2):
            t = jnp.asarray([0, 1, 2, 3])
            losses = jnp.asarray([0.1, 0.1, 0.1, 10.0])
            state = SMP.loss_aware_update(state, t, losses)
        w = SMP.loss_aware_weights(state)
        assert float(w[3]) > float(w[0]) * 10
        np.testing.assert_allclose(float(w.sum()), 1.0, atol=1e-5)

    def test_factory(self):
        st, sample, update = SMP.create_named_schedule_sampler("uniform", 100)
        t, w = sample(jax.random.PRNGKey(1), 8)
        assert t.shape == (8,)
        st2, sample2, update2 = SMP.create_named_schedule_sampler("loss-second-moment", 100)
        t2, w2 = sample2(jax.random.PRNGKey(2), 8, st2)
        assert t2.shape == (8,)


class TestSkeleton:
    def test_fk_ik_roundtrip(self):
        """IK then FK with the same offsets reproduces joint positions."""
        from mixermdm_tpu.utils.skeleton import Skeleton

        rng = np.random.default_rng(0)
        skel = Skeleton()
        # Build a valid pose via FK from random small rotations.
        T = 4
        quats = np.zeros((T, 22, 4))
        quats[..., 0] = 1.0
        noise = rng.standard_normal((T, 22, 3)) * 0.1
        quats[..., 1:] = noise
        quats = quats / np.linalg.norm(quats, axis=-1, keepdims=True)
        skel.offset = HML_OFFSETS_SCALED.copy()
        root = rng.standard_normal((T, 3))
        joints = skel.forward_kinematics(quats, root)

        ik = skel.inverse_kinematics(joints)
        joints2 = skel.forward_kinematics(ik, joints[:, 0])
        # Frame 0 is special-cased by IK (root_quat[0] forced to identity —
        # reference skeleton.py:90 assumes a canonicalised first frame), so
        # the roundtrip guarantee holds for frames 1+.
        np.testing.assert_allclose(joints[1:], joints2[1:], atol=1e-4)

    def test_uniform_skeleton_scales(self):
        from mixermdm_tpu.utils.skeleton import Skeleton, uniform_skeleton

        rng = np.random.default_rng(1)
        skel = Skeleton()
        quats = np.zeros((3, 22, 4))
        quats[..., 0] = 1.0
        skel.offset = HML_OFFSETS_SCALED.copy()
        joints = skel.forward_kinematics(quats, np.zeros((3, 3)))

        target_offsets = HML_OFFSETS_SCALED * 2.0
        out = uniform_skeleton(joints, target_offsets=target_offsets)
        assert out.shape == joints.shape
        # Bones should be ~2x longer.
        b_src = np.linalg.norm(joints[0, 1] - joints[0, 0])
        b_out = np.linalg.norm(out[0, 1] - out[0, 0])
        assert abs(b_out / b_src - 2.0) < 0.1


import numpy as _np
from mixermdm_tpu.utils.constants import HML_RAW_OFFSETS as _RAW

HML_OFFSETS_SCALED = _RAW.astype(_np.float64) * 0.3
