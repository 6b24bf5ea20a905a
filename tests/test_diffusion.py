"""Tests for schedules, respacing, and the scan-based DDPM/DDIM engine."""

import numpy as np
import jax
import jax.numpy as jnp

from mixermdm_tpu.diffusion import schedule as S
from mixermdm_tpu.diffusion import gaussian as G


class TestSchedules:
    def test_linear_endpoints(self):
        b = S.linear_betas(1000)
        assert abs(b[0] - 0.0001) < 1e-12 and abs(b[-1] - 0.02) < 1e-12

    def test_cosine_range(self):
        b = S.cosine_betas(1000)
        assert (b > 0).all() and (b <= 0.999).all()
        assert b[0] < b[-1]

    def test_ddim50_spacing(self):
        steps = S.space_timesteps(1000, "ddim50")
        assert len(steps) == 50
        assert steps[0] == 0 and steps == sorted(steps)
        assert all(s < 1000 for s in steps)

    def test_respaced_alphas_match_subset(self):
        betas = S.cosine_betas(100)
        full = S.make_schedule(betas)
        use = S.space_timesteps(100, "ddim10")
        sub = S.make_schedule(betas, use)
        np.testing.assert_allclose(
            np.asarray(sub.alphas_cumprod),
            np.asarray(full.alphas_cumprod)[np.asarray(use)],
            rtol=1e-5,
        )
        np.testing.assert_array_equal(np.asarray(sub.timestep_map), np.asarray(use))

    def test_posterior_arrays(self):
        betas = S.cosine_betas(10)
        s = S.make_schedule(betas)
        ac = np.cumprod(1 - betas)
        acp = np.append(1.0, ac[:-1])
        pv = betas * (1 - acp) / (1 - ac)
        np.testing.assert_allclose(np.asarray(s.posterior_variance), pv, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s.posterior_mean_coef1),
            betas * np.sqrt(acp) / (1 - ac),
            rtol=1e-5,
        )


class TestEngine:
    def _sched(self, n=20):
        return S.make_schedule(S.cosine_betas(n))

    def test_q_sample_moments(self):
        s = self._sched()
        rng = jax.random.PRNGKey(0)
        x0 = jnp.ones((4096, 8))
        t = jnp.full((4096,), 10, jnp.int32)
        noise = jax.random.normal(rng, x0.shape)
        xt = G.q_sample(s, x0, t, noise)
        want_mean = float(s.sqrt_alphas_cumprod[10])
        assert abs(float(xt.mean()) - want_mean) < 0.02

    def test_ddim_oracle_recovers_x0(self):
        """A model that always predicts the true x0 must converge to it."""
        s = self._sched(50)
        x0 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 4)), jnp.float32)

        def model_fn(x, t_orig):
            return x0

        out = G.ddim_sample_loop(
            model_fn, s, x0.shape, jax.random.PRNGKey(1), eta=0.0
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)

    def test_ddpm_oracle_close_to_x0(self):
        s = self._sched(50)
        x0 = jnp.zeros((2, 6, 4))

        def model_fn(x, t_orig):
            return x0

        out = G.p_sample_loop(model_fn, s, x0.shape, jax.random.PRNGKey(2))
        # Last DDPM step adds no noise at t=0, and the posterior collapses on x0.
        assert float(jnp.abs(out - x0).max()) < 0.05

    def test_respaced_loop_runs_and_maps_timesteps(self):
        betas = S.cosine_betas(100)
        s = S.make_schedule(betas, S.space_timesteps(100, "ddim10"))
        seen = []

        def model_fn(x, t_orig):
            return jnp.zeros_like(x)

        out = G.ddim_sample_loop(model_fn, s, (1, 4, 2), jax.random.PRNGKey(3))
        assert out.shape == (1, 4, 2)
        # Timestep map covers originals, first entry 0.
        tm = np.asarray(s.timestep_map)
        assert tm[0] == 0 and tm[-1] < 100 and len(tm) == 10

    def test_mse_training_losses(self):
        s = self._sched(30)
        x0 = jnp.asarray(np.random.default_rng(1).standard_normal((3, 5, 7)), jnp.float32)
        t = jnp.asarray([0, 10, 29], jnp.int32)

        def perfect_model(x_t, t_orig):
            return x0

        out = G.mse_training_losses(perfect_model, s, x0, t, jax.random.PRNGKey(4))
        np.testing.assert_allclose(np.asarray(out["mse"]), 0.0, atol=1e-10)
        assert out["pred"].shape == x0.shape

    def test_eps_prediction_consistency(self):
        s = self._sched(30)
        rng = jax.random.PRNGKey(5)
        x0 = jax.random.normal(rng, (2, 4, 3))
        noise = jax.random.normal(jax.random.PRNGKey(6), x0.shape)
        t = jnp.asarray([5, 20], jnp.int32)
        xt = G.q_sample(s, x0, t, noise)
        eps = G.predict_eps_from_xstart(s, xt, t, x0)
        np.testing.assert_allclose(np.asarray(eps), np.asarray(noise), atol=1e-3)
        x0_back = G.predict_xstart_from_eps(s, xt, t, eps)
        np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0), atol=1e-3)
