"""DPM-Solver++(2M) sampler tests.

TPU-native addition (the reference ships only DDPM/DDIM loops,
``/root/reference/src/models/utils/gaussian_diffusion.py:694-1069``): a
second-order multistep probability-flow solver that reaches DDIM-50-level
ODE accuracy in ~half the model calls.  Tested by construction invariants
(constant-model exactness), measured convergence order against a dense-DDIM
ground truth, and the system/CLI wiring.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mixermdm_tpu.diffusion.gaussian as G
from mixermdm_tpu.diffusion.gaussian import dpmpp_coefficients, dpmpp_sample_loop
from mixermdm_tpu.diffusion.mixer_diffusion import (
    ddim_sample_loop_x2,
    dpmpp_sample_loop_x2,
)
from mixermdm_tpu.diffusion.schedule import named_schedule, resolve_sampler_strategy
from mixermdm_tpu.utils.normalizer import Normalizer


def ident_normalizer(d=3):
    return Normalizer(np.zeros(d, np.float32), np.ones(d, np.float32))


class TestCoefficients:
    def test_tables_are_finite_and_boundary_correct(self):
        s = named_schedule("cosine", 100, "ddim10")
        sig_ratio, alp_next, phi, c2 = (np.asarray(a) for a in dpmpp_coefficients(s))
        for a in (sig_ratio, alp_next, phi, c2):
            assert np.isfinite(a).all()
            assert a.shape == (10,)
        # first step has no multistep history; final step is first-order
        assert c2[0] == 0.0 and c2[-1] == 0.0
        # the final step integrates to clean data: x = x0 exactly
        assert sig_ratio[-1] == 0.0 and phi[-1] == -1.0 and alp_next[-1] == 1.0
        # h > 0 going backward in time => phi = e^{-h}-1 in (-1, 0)
        assert (phi < 0).all() and (phi >= -1).all()
        assert (c2[1:-1] > 0).all()

    def test_n_eff_truncation_matches_suffix(self):
        """A warm-started chain's tables equal the full chain's tail (the
        multistep history restarts, so only position 0 differs in c2)."""
        s = named_schedule("cosine", 100, "ddim10")
        full = [np.asarray(a) for a in dpmpp_coefficients(s)]
        trunc = [np.asarray(a) for a in dpmpp_coefficients(s, 6)]
        for f, t in (zip(full, trunc)):
            np.testing.assert_allclose(t[1:], f[4 + 1 :], rtol=1e-6)
        assert trunc[3][0] == 0.0  # c2 restart


class TestExactness:
    """A constant-x0 model makes every step's local problem exact, so any
    consistent solver must return exactly x0."""

    def test_single_stream_constant_model(self):
        s = named_schedule("cosine", 100, "ddim8")
        target = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 6, 4)), jnp.float32
        )
        out = dpmpp_sample_loop(lambda x, t: target, s, target.shape,
                                jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-6)

    def test_single_stream_warm_start_constant_model(self):
        s = named_schedule("cosine", 100, "ddim8")
        target = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 6, 4)), jnp.float32
        )
        out = dpmpp_sample_loop(
            lambda x, t: target, s, target.shape, jax.random.PRNGKey(0),
            skip_timesteps=3, init_image=jnp.zeros_like(target),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-6)

    def test_dual_stream_constant_model(self):
        s = named_schedule("cosine", 100, "ddim8")
        target = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, 6, 6)), jnp.float32
        )
        out = dpmpp_sample_loop_x2(
            lambda x, x2, t, mask, cond: target, s, target.shape,
            jax.random.PRNGKey(0), None,
            normalizer1=ident_normalizer(), normalizer2=ident_normalizer(),
            align=False, nfeats=3,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-6)


class TestConvergenceOrder:
    """On a smooth nonlinear model, the 2M solver's ODE error at N steps
    must beat first-order DDIM's — and dpmpp at N/2 should be in DDIM-N's
    error range (the headline claim: half the model calls)."""

    def _run(self, loop, strat, seed=3):
        W = jnp.asarray(
            np.random.default_rng(4).normal(size=(6, 6)) * 0.3, jnp.float32
        )

        def smooth(x, x2, t, mask, cond):
            return jnp.tanh(x @ W) + 0.1 * jnp.sin(x2)

        s = named_schedule("cosine", 100, strat)
        return loop(
            smooth, s, (2, 6, 6), jax.random.PRNGKey(seed), None,
            normalizer1=ident_normalizer(), normalizer2=ident_normalizer(),
            align=False, nfeats=3,
        )

    def test_second_order_beats_ddim(self):
        gt = self._run(ddim_sample_loop_x2, "ddim100")
        err = {}
        for n in (10, 20):
            err[("ddim", n)] = float(
                jnp.abs(self._run(ddim_sample_loop_x2, f"ddim{n}") - gt).max()
            )
            err[("dpmpp", n)] = float(
                jnp.abs(self._run(dpmpp_sample_loop_x2, f"ddim{n}") - gt).max()
            )
        assert err[("dpmpp", 10)] < err[("ddim", 10)]
        assert err[("dpmpp", 20)] < err[("ddim", 20)]
        # half the steps, comparable accuracy
        assert err[("dpmpp", 10)] < 1.5 * err[("ddim", 20)]


class TestResolveSamplerStrategy:
    def test_defaults(self):
        from mixermdm_tpu.config import Config

        cfg = Config.wrap({})
        assert resolve_sampler_strategy(cfg) == ("ddim", "ddim50")

    def test_dpmpp_shorthand(self):
        from mixermdm_tpu.config import Config

        cfg = Config.wrap({"STRATEGY": "dpmpp25"})
        assert resolve_sampler_strategy(cfg) == ("dpmpp", "ddim25")

    def test_explicit_type(self):
        from mixermdm_tpu.config import Config

        cfg = Config.wrap({"SAMPLER_TYPE": "dpmpp", "STRATEGY": "ddim25"})
        assert resolve_sampler_strategy(cfg) == ("dpmpp", "ddim25")

    def test_unknown_raises(self):
        from mixermdm_tpu.config import Config

        with pytest.raises(ValueError):
            resolve_sampler_strategy(Config.wrap({"SAMPLER_TYPE": "euler"}))


class TestSystemWiring:
    def test_mixer_dpmpp_samples(self):
        from tests.test_systems import tiny_mixer, B, T

        sys_ = tiny_mixer()
        sys_.sampler_type = "dpmpp"
        params = sys_.init_params(jax.random.PRNGKey(0))
        cond = jax.random.normal(jax.random.PRNGKey(1), (B, 8 * sys_.text_dim))
        out = sys_.sample(params, cond, T, jax.random.PRNGKey(2))
        assert out.shape == (B, T, 524)
        assert bool(jnp.isfinite(out).all())

    def test_in2in_dpmpp_strategy_config(self):
        from tests.test_systems import tiny_cfg, TINY_CLIP, B, T
        from mixermdm_tpu.systems import In2INSystem

        sys_ = In2INSystem(tiny_cfg(STRATEGY="dpmpp4"), mode="individual",
                           clip_cfg=TINY_CLIP)
        assert sys_.sampler_type == "dpmpp"
        assert sys_.sample_schedule.num_timesteps == 4
        params = sys_.init_params(jax.random.PRNGKey(0))
        cond = sys_.text_process(params, ["a person walks"] * B, "individual")
        out = sys_.sample(params, cond, T, jax.random.PRNGKey(1))
        assert out.shape == (B, T, 262)
        assert bool(jnp.isfinite(out).all())

    def test_apply_sampler_overrides(self):
        from tests.test_systems import tiny_mixer
        from mixermdm_tpu.systems import apply_sampler_overrides

        sys_ = tiny_mixer()
        apply_sampler_overrides(sys_, "dpmpp", 2)
        assert sys_.sampler_type == "dpmpp"
        assert sys_.sample_schedule.num_timesteps == 2
        with pytest.raises(ValueError):
            apply_sampler_overrides(sys_, "euler")
