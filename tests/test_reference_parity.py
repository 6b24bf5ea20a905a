"""Composed parity vs the LIVE torch reference (random weights, converted).

VERDICT round-1 item 1: primitives were parity-tested in round 1
(test_torch_parity.py); this file checks *composed* call paths against the
actual reference implementation imported from /root/reference/src with
torch-cpu.  Engine-level checks use 2-D (B, F) tensors so the reference's
dim-1 channel split coincides with our feature (last-axis) split.
"""

import numpy as np
import pytest
import torch

from tests.reference_compat import import_reference

import jax
import jax.numpy as jnp

from mixermdm_tpu.diffusion import gaussian as G
from mixermdm_tpu.diffusion import vlb as V
from mixermdm_tpu.diffusion.schedule import (
    get_named_beta_schedule,
    make_schedule,
    space_timesteps,
)

gd = import_reference("models.utils.gaussian_diffusion")

N_STEPS = 20


def _ref_diffusion(mean_type, var_type, use_timesteps=None):
    betas = get_named_beta_schedule("cosine", N_STEPS)
    kwargs = dict(
        betas=betas,
        model_mean_type=mean_type,
        model_var_type=var_type,
        loss_type=gd.LossType.MSE,
    )
    if use_timesteps is not None:
        ref = gd.SpacedDiffusion(use_timesteps=use_timesteps, **kwargs)
    else:
        ref = gd.GaussianDiffusion(**kwargs)
    s = make_schedule(betas, use_timesteps)
    return ref, s


class TestEngineEnumParity:
    """LEARNED/LEARNED_RANGE variances + PREVIOUS_X mean vs the reference
    (gaussian_diffusion.py:445-539)."""

    @pytest.mark.parametrize(
        "var_name,ref_var",
        [("learned", "LEARNED"), ("learned_range", "LEARNED_RANGE")],
    )
    def test_learned_variances(self, var_name, ref_var):
        ref, s = _ref_diffusion(gd.ModelMeanType.START_X, gd.ModelVarType[ref_var])
        rng = np.random.default_rng(0)
        B, F = 4, 6
        x = rng.standard_normal((B, F)).astype(np.float32)
        out = (0.3 * rng.standard_normal((B, 2 * F))).astype(np.float32)
        t = np.array([0, 3, 11, N_STEPS - 1])

        ref_out = ref.p_mean_variance(
            lambda *_a, **_k: torch.from_numpy(out),
            torch.from_numpy(x),
            torch.from_numpy(t),
            clip_denoised=False,
        )
        mine = G.p_mean_variance(
            lambda _x, _t: jnp.asarray(out), s, jnp.asarray(x), jnp.asarray(t),
            mean_type=G.MEAN_START_X, var_type=var_name, clip_denoised=False,
        )
        for k in ("mean", "variance", "log_variance", "pred_xstart"):
            np.testing.assert_allclose(
                np.asarray(mine[k]), ref_out[k].numpy(), atol=3e-5, rtol=3e-5,
                err_msg=f"{var_name}:{k}",
            )

    def test_previous_x_mean(self):
        ref, s = _ref_diffusion(gd.ModelMeanType.PREVIOUS_X, gd.ModelVarType.FIXED_SMALL)
        rng = np.random.default_rng(1)
        B, F = 3, 5
        x = rng.standard_normal((B, F)).astype(np.float32)
        out = rng.standard_normal((B, F)).astype(np.float32)
        t = np.array([0, 7, N_STEPS - 1])

        ref_out = ref.p_mean_variance(
            lambda *_a, **_k: torch.from_numpy(out),
            torch.from_numpy(x), torch.from_numpy(t), clip_denoised=False,
        )
        mine = G.p_mean_variance(
            lambda _x, _t: jnp.asarray(out), s, jnp.asarray(x), jnp.asarray(t),
            mean_type=G.MEAN_PREVIOUS_X, var_type="fixed_small", clip_denoised=False,
        )
        for k in ("mean", "variance", "log_variance", "pred_xstart"):
            # fixed variances are kept broadcastable (B,1) here vs the
            # reference's full-shape expansion
            a = np.broadcast_to(np.asarray(mine[k]), ref_out[k].shape)
            np.testing.assert_allclose(
                a, ref_out[k].numpy(), atol=3e-5, rtol=3e-5, err_msg=k,
            )

    def test_learned_range_respaced(self):
        """Respaced chain: max_log must use the RESPACED betas (reference
        SpacedDiffusion re-derives betas, :2138-2146)."""
        use = space_timesteps(N_STEPS, "ddim5")
        ref, s = _ref_diffusion(
            gd.ModelMeanType.START_X, gd.ModelVarType.LEARNED_RANGE, use
        )
        rng = np.random.default_rng(2)
        B, F = 2, 4
        x = rng.standard_normal((B, F)).astype(np.float32)
        out = (0.2 * rng.standard_normal((B, 2 * F))).astype(np.float32)
        t = np.array([0, 4])

        ref_out = ref.p_mean_variance(
            lambda *_a, **_k: torch.from_numpy(out),
            torch.from_numpy(x), torch.from_numpy(t), clip_denoised=False,
        )
        mine = G.p_mean_variance(
            lambda _x, _t: jnp.asarray(out), s, jnp.asarray(x), jnp.asarray(t),
            mean_type=G.MEAN_START_X, var_type="learned_range", clip_denoised=False,
        )
        for k in ("mean", "variance", "log_variance", "pred_xstart"):
            np.testing.assert_allclose(
                np.asarray(mine[k]), ref_out[k].numpy(), atol=3e-5, rtol=3e-5,
                err_msg=k,
            )

    def test_vb_terms_learned(self):
        """_vb_terms_bpd with LEARNED variance vs reference :1071-1104."""
        ref, s = _ref_diffusion(gd.ModelMeanType.START_X, gd.ModelVarType.LEARNED)
        rng = np.random.default_rng(3)
        B, F = 3, 6
        x_start = rng.standard_normal((B, F)).astype(np.float32)
        x_t = rng.standard_normal((B, F)).astype(np.float32)
        out = (0.2 * rng.standard_normal((B, 2 * F))).astype(np.float32)
        t = np.array([0, 5, N_STEPS - 1])

        ref_out = ref._vb_terms_bpd(
            lambda *_a, **_k: torch.from_numpy(out),
            torch.from_numpy(x_start), torch.from_numpy(x_t), torch.from_numpy(t),
            clip_denoised=False,
        )
        mine = V.vb_terms_bpd(
            lambda _x, _t: jnp.asarray(out), s, jnp.asarray(x_start),
            jnp.asarray(x_t), jnp.asarray(t),
            clip_denoised=False, var_type="learned",
        )
        np.testing.assert_allclose(
            np.asarray(mine["output"]), ref_out["output"].numpy(), atol=3e-5, rtol=3e-5
        )


class TestGuidedSampling:
    """cond_fn wiring through the scan loops (reference p_sample :656 /
    ddim_sample :822)."""

    def _model(self):
        # A fixed pseudo-denoiser predicting x0 = tanh(x) (START_X type).
        return lambda x, t: jnp.tanh(x)

    def test_ddim_cond_fn_shifts_samples(self):
        s = make_schedule(get_named_beta_schedule("cosine", N_STEPS))
        shape = (4, 6)
        rng = jax.random.PRNGKey(0)
        base = G.ddim_sample_loop(self._model(), s, shape, rng)
        guided = G.ddim_sample_loop(
            self._model(), s, shape, rng, cond_fn=lambda x, t: 5.0 * jnp.ones_like(x)
        )
        assert np.all(np.isfinite(np.asarray(guided)))
        # Positive score gradient pushes samples up.
        assert float(jnp.mean(guided) - jnp.mean(base)) > 0.05

    def test_ddpm_cond_fn_shifts_samples(self):
        s = make_schedule(get_named_beta_schedule("cosine", N_STEPS))
        shape = (4, 6)
        rng = jax.random.PRNGKey(1)
        base = G.p_sample_loop(self._model(), s, shape, rng)
        guided = G.p_sample_loop(
            self._model(), s, shape, rng, cond_fn=lambda x, t: 5.0 * jnp.ones_like(x)
        )
        assert np.all(np.isfinite(np.asarray(guided)))
        assert float(jnp.mean(guided) - jnp.mean(base)) > 0.05


class TestLearnedVarTraining:
    def test_vb_term_trains_only_variance_half(self):
        """The frozen-out trick (reference :1149-1152): d(vb)/d(mean-half)=0,
        d(vb)/d(var-half)!=0; mse still trains the mean half."""
        s = make_schedule(get_named_beta_schedule("cosine", N_STEPS))
        B, F = 3, 4
        rng = jax.random.PRNGKey(2)
        x_start = jax.random.normal(rng, (B, F))
        t = jnp.asarray([1, 5, 10])

        def losses(w):
            w_mean, w_var = w
            model = lambda x, _t: jnp.concatenate(
                [w_mean * jnp.ones_like(x), w_var * jnp.ones_like(x)], axis=-1
            )
            terms = G.mse_training_losses(
                model, s, x_start, t, jax.random.PRNGKey(3), var_type="learned"
            )
            return terms

        grad_vb = jax.grad(lambda w: losses(w)["vb"].sum())(jnp.ones(2))
        assert abs(float(grad_vb[0])) < 1e-8      # mean half frozen in vb
        assert abs(float(grad_vb[1])) > 1e-6      # variance half trains
        grad_mse = jax.grad(lambda w: losses(w)["mse"].sum())(jnp.ones(2))
        assert abs(float(grad_mse[0])) > 1e-6     # mse trains the mean half
        terms = losses(jnp.ones(2))
        np.testing.assert_allclose(
            np.asarray(terms["loss"]), np.asarray(terms["mse"] + terms["vb"]), rtol=1e-6
        )

    def test_previous_x_training_target(self):
        """PREVIOUS_X target is the q-posterior mean (reference :1163-1167)."""
        s = make_schedule(get_named_beta_schedule("cosine", N_STEPS))
        B, F = 2, 4
        x_start = jax.random.normal(jax.random.PRNGKey(4), (B, F))
        t = jnp.asarray([3, 9])
        terms = G.mse_training_losses(
            lambda x, _t: jnp.zeros_like(x), s, x_start, t, jax.random.PRNGKey(5),
            mean_type=G.MEAN_PREVIOUS_X,
        )
        expected = G.q_posterior_mean_variance(s, x_start, terms["x_t"], t)[0]
        np.testing.assert_allclose(
            np.asarray(terms["target"]), np.asarray(expected), rtol=1e-6
        )
