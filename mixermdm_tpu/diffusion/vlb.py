"""Variational-lower-bound utilities + likelihood evaluation.

Parity source ``/root/reference/src/models/utils/gaussian_diffusion.py``:
``normal_kl``:173, ``approx_standard_normal_cdf``:201,
``discretized_gaussian_log_likelihood``:208, ``_vb_terms_bpd``:1071,
``_prior_bpd``:1189, ``calc_bpd_loop``:1207, and the KL loss types
(:1134-1144).  The reference's per-timestep Python loop in ``calc_bpd_loop``
becomes a ``lax.scan``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .gaussian import (
    MEAN_START_X,
    VAR_FIXED_SMALL,
    p_mean_variance,
    predict_eps_from_xstart,
    q_posterior_mean_variance,
    q_sample,
)
from .schedule import DiffusionSchedule


def mean_flat(x):
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) elementwise, in nats."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of a discretised (1/255-bin) gaussian."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, 1e-12))),
    )


def vb_terms_bpd(
    model_fn: Callable,
    s: DiffusionSchedule,
    x_start,
    x_t,
    t,
    *,
    clip_denoised: bool = False,
    mean_type: str = MEAN_START_X,
    var_type: str = VAR_FIXED_SMALL,
):
    """One VLB term in bits: KL(q || p) for t>0, decoder NLL at t==0."""
    true_mean, _, true_log_var = q_posterior_mean_variance(s, x_start, x_t, t)
    out = p_mean_variance(
        model_fn, s, x_t, t,
        mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
    )
    kl = mean_flat(normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"]))
    kl = kl / jnp.log(2.0)

    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, out["mean"], 0.5 * out["log_variance"]
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)

    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def prior_bpd(s: DiffusionSchedule, x_start):
    B = x_start.shape[0]
    t = jnp.full((B,), s.num_timesteps - 1, jnp.int32)
    from .gaussian import extract

    qt_mean = extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    qt_log_var = jnp.log1p(-extract(s.alphas_cumprod, t, x_start.ndim))
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return mean_flat(kl) / jnp.log(2.0)


def calc_bpd_loop(
    model_fn: Callable,
    s: DiffusionSchedule,
    x_start,
    rng: jax.Array,
    *,
    clip_denoised: bool = False,
):
    """Full VLB sweep over all timesteps as one ``lax.scan``
    (reference :1207-1262 loops in Python)."""
    B = x_start.shape[0]
    ts = jnp.arange(s.num_timesteps - 1, -1, -1)

    def body(rng, i):
        rng, step_rng = jax.random.split(rng)
        t = jnp.full((B,), i, jnp.int32)
        noise = jax.random.normal(step_rng, x_start.shape, x_start.dtype)
        x_t = q_sample(s, x_start, t, noise)
        out = vb_terms_bpd(model_fn, s, x_start, x_t, t, clip_denoised=clip_denoised)
        xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
        eps = predict_eps_from_xstart(s, x_t, t, out["pred_xstart"])
        eps_mse = mean_flat((eps - noise) ** 2)
        return rng, (out["output"], xstart_mse, eps_mse)

    _, (vb, xstart_mse, mse) = jax.lax.scan(body, rng, ts)
    vb = vb.T           # (B, T)
    pb = prior_bpd(s, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + pb,
        "prior_bpd": pb,
        "vb": vb,
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }
