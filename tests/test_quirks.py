"""Tests pinning the reference's behavioural quirks (see README)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.diffusion.mixer_diffusion import (
    _hinge_weight,
    d_hinge_loss,
    g_hinge_loss,
    process_xstart_dual,
)
from mixermdm_tpu.diffusion.schedule import cosine_betas, make_schedule
from mixermdm_tpu.utils.normalizer import Normalizer


def nontrivial_normalizer(dim=262, seed=0):
    rng = np.random.default_rng(seed)
    return Normalizer(
        jnp.asarray(rng.standard_normal(dim), jnp.float32),
        jnp.asarray(rng.random(dim) + 0.5, jnp.float32),
    )


class TestProcessXstartGate:
    """The t==0 branch must skip re-normalisation so pred_xstart2 is raw
    motion (reference gaussian_diffusion.py:2052-2056)."""

    def test_t0_returns_raw(self):
        n1 = nontrivial_normalizer(seed=1)
        n2 = nontrivial_normalizer(seed=2)
        mixed = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 524))
        _, pred2 = process_xstart_dual(mixed, jnp.asarray(0), n1, n2, align=False)
        np.testing.assert_allclose(np.asarray(pred2), np.asarray(mixed), atol=1e-6)

    def test_t_positive_normalises(self):
        n1 = nontrivial_normalizer(seed=1)
        n2 = nontrivial_normalizer(seed=2)
        mixed = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 524))
        pred1, pred2 = process_xstart_dual(mixed, jnp.asarray(5), n1, n2, align=False)
        # pred2 is model-2 normalised, not raw.
        assert float(jnp.abs(pred2 - mixed).max()) > 1e-3
        want = n2.forward(mixed.reshape(2, 6, 2, -1)).reshape(2, 6, -1)
        np.testing.assert_allclose(np.asarray(pred2), np.asarray(want), atol=1e-5)
        # pred1 is per-person model-1 normalised.
        want1 = jnp.concatenate(
            [n1.forward(mixed[..., :262]), n1.forward(mixed[..., 262:])], axis=-1
        )
        np.testing.assert_allclose(np.asarray(pred1), np.asarray(want1), atol=1e-5)


class TestHingeMaskQuirk:
    """hinge losses average over PADDING frames in reference mode
    (gaussian_diffusion.py:1503,1530); 'valid' mode is the corrected one."""

    def test_reference_mode_counts_padding(self):
        B, T = 2, 10
        mask = jnp.ones((B, T, 2)).at[:, 6:].set(0.0)  # 4 padding frames
        w_ref = _hinge_weight(mask, B, T, "reference")
        w_val = _hinge_weight(mask, B, T, "valid")
        assert float(w_ref.sum()) == 2 * 4   # padding frames
        assert float(w_val.sum()) == 2 * 6   # valid frames
        np.testing.assert_allclose(np.asarray(w_ref + w_val), 1.0)

    def test_full_length_reference_loss_is_zero(self):
        B, T = 2, 8
        mask = jnp.ones((B, T, 2))
        w = _hinge_weight(mask, B, T, "reference")
        pred = jnp.ones((B, T, 1)) * 3.0
        assert float(g_hinge_loss(pred, w)) == 0.0

    def test_d_hinge_values(self):
        w = jnp.ones((1, 4, 1))
        pred = jnp.asarray([[[2.0], [0.5], [-1.0], [0.0]]])
        # real target (+1): relu(1 - pred) = [0, .5, 2, 1] -> mean 0.875
        assert abs(float(d_hinge_loss(pred, 1.0, w)) - 0.875) < 1e-6
        # fake target (-1): relu(1 + pred) = [3, 1.5, 0, 1] -> mean 1.375
        assert abs(float(d_hinge_loss(pred, -1.0, w)) - 1.375) < 1e-6


class TestX2NormSkipQuirk:
    """training_losses drops the x_start2 normalisation (reference :1590)."""

    def test_flag_controls_x2_space(self):
        import sys as _s, os

        _s.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from __graft_entry__ import _tiny_system
        from mixermdm_tpu.diffusion.mixer_diffusion import mixer_training_losses

        system = _tiny_system()
        # Non-identity normalizer2 so the skip is observable.
        system.normalizer2 = nontrivial_normalizer(seed=3)
        params = system.init_params(jax.random.PRNGKey(0))
        # Perturb zero-init output layers so the denoisers actually read x2_t.
        params = jax.tree_util.tree_map(
            lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(9), x.shape),
            params,
        )
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, 8 * system.text_dim))
        motions = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 524))
        mask = jnp.ones((2, 12, 2)).at[:, 9:].set(0.0)
        t = jnp.asarray([3, 5])

        def losses(faithful):
            lp = {
                "mixer": system.mixer_params(params),
                "disc_i": params["disc_i"],
                "disc_I": params["disc_I"],
            }
            return mixer_training_losses(
                system._mixer_forward,
                lambda p, x, tt, m, c, train=False, rngs=None: system.disc_i.apply(
                    {"params": p}, x, tt, m, c
                ),
                lambda p, x, tt, m, c, train=False, rngs=None: system.disc_I.apply(
                    {"params": p}, x, tt, m, c
                ),
                lp, system.train_schedule, motions, t, cond, mask,
                jax.random.PRNGKey(4), mode="generator",
                normalizer1=system.normalizer1, normalizer2=system.normalizer2,
                cond_slices=system.mixer_cfg.cond_slices(),
                align=False, faithful_x2_norm_skip=faithful,
            )["total"]

        a = float(losses(True))
        b = float(losses(False))
        assert np.isfinite(a) and np.isfinite(b)
        assert a != b  # the quirk is observable and the flag controls it
