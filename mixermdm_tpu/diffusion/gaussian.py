"""Functional DDPM/DDIM engine: q/p math + whole-chain ``lax.scan`` samplers.

Re-design of the reference's ``GaussianDiffusion`` class
(``/root/reference/src/models/utils/gaussian_diffusion.py:314-1262``) as pure
functions over a :class:`~mixermdm_tpu.diffusion.schedule.DiffusionSchedule`.
The reference iterates denoising steps in Python (``:1046``); here the loop is
one ``lax.scan`` so XLA compiles the entire chain into a single program —
no per-step dispatch, static shapes, donated carry.

Model functions are plain callables ``model_fn(x, t_orig) -> output`` where
``t_orig`` is the *original* (un-respaced) timestep, reproducing the
``_WrappedModel`` timestep remapping (gaussian_diffusion.py:2185-2190).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule

MEAN_START_X = "start_x"
MEAN_EPSILON = "epsilon"

VAR_FIXED_SMALL = "fixed_small"
VAR_FIXED_LARGE = "fixed_large"


def extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """arr[t] broadcast to an ndim tensor with leading batch dim."""
    return arr[t].reshape(t.shape + (1,) * (ndim - 1))


def q_sample(s: DiffusionSchedule, x_start, t, noise):
    """Sample q(x_t | x_0) (reference :401-419)."""
    nd = x_start.ndim
    return (
        extract(s.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(s: DiffusionSchedule, x_start, x_t, t):
    nd = x_t.ndim
    mean = (
        extract(s.posterior_mean_coef1, t, nd) * x_start
        + extract(s.posterior_mean_coef2, t, nd) * x_t
    )
    variance = extract(s.posterior_variance, t, nd)
    log_variance = extract(s.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


def predict_xstart_from_eps(s: DiffusionSchedule, x_t, t, eps):
    nd = x_t.ndim
    return (
        extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_xstart(s: DiffusionSchedule, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(s.sqrt_recipm1_alphas_cumprod, t, nd)


def model_variance(s: DiffusionSchedule, t, ndim: int, var_type: str):
    if var_type == VAR_FIXED_SMALL:
        return (
            extract(s.posterior_variance, t, ndim),
            extract(s.posterior_log_variance_clipped, t, ndim),
        )
    if var_type == VAR_FIXED_LARGE:
        return (
            extract(s.fixed_large_variance, t, ndim),
            extract(s.log_fixed_large_variance, t, ndim),
        )
    raise NotImplementedError(var_type)


def p_mean_variance(
    model_fn: Callable,
    s: DiffusionSchedule,
    x,
    t,
    *,
    mean_type: str = MEAN_START_X,
    var_type: str = VAR_FIXED_SMALL,
    clip_denoised: bool = False,
    denoised_fn: Callable | None = None,
):
    """p(x_{t-1} | x_t) stats + x0 prediction (reference :445-539)."""
    t_orig = s.timestep_map[t]
    model_output = model_fn(x, t_orig)

    variance, log_variance = model_variance(s, t, x.ndim, var_type)

    if mean_type == MEAN_START_X:
        pred_xstart = model_output
    elif mean_type == MEAN_EPSILON:
        pred_xstart = predict_xstart_from_eps(s, x, t, model_output)
    else:
        raise NotImplementedError(mean_type)

    if denoised_fn is not None:
        pred_xstart = denoised_fn(pred_xstart)
    if clip_denoised:
        pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)

    mean, _, _ = q_posterior_mean_variance(s, pred_xstart, x, t)
    return {
        "mean": mean,
        "variance": variance,
        "log_variance": log_variance,
        "pred_xstart": pred_xstart,
    }


def _nonzero_mask(t, ndim):
    return (t != 0).astype(jnp.float32).reshape(t.shape + (1,) * (ndim - 1))


def ddpm_step(s: DiffusionSchedule, out: dict, t, rng):
    """x_{t-1} ~ p(x_{t-1}|x_t) given p_mean_variance output (reference :632-692)."""
    noise = jax.random.normal(rng, out["mean"].shape, out["mean"].dtype)
    mask = _nonzero_mask(t, out["mean"].ndim)
    return out["mean"] + mask * jnp.exp(0.5 * out["log_variance"]) * noise


def ddim_step(s: DiffusionSchedule, x, t, pred_xstart, rng, eta: float = 0.0):
    """Deterministic (eta=0) DDIM update, eq. 12 (reference :799-849)."""
    nd = x.ndim
    eps = predict_eps_from_xstart(s, x, t, pred_xstart)
    alpha_bar_prev = extract(s.alphas_cumprod_prev, t, nd)
    if eta == 0.0:
        # Deterministic path: no sigma, no per-step noise draw.
        return pred_xstart * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
            1 - alpha_bar_prev
        ) * eps
    alpha_bar = extract(s.alphas_cumprod, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    mean_pred = pred_xstart * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
        1 - alpha_bar_prev - sigma**2
    ) * eps
    noise = jax.random.normal(rng, x.shape, x.dtype)
    return mean_pred + _nonzero_mask(t, nd) * sigma * noise


def _apply_traj_control(img, x_start):
    """Pin root-trajectory dims from x_start each step (reference :1052-1055)."""
    T = img.shape[1]
    idx = jnp.asarray([0, 2, 262, 264])
    return img.at[:, :, idx].set(x_start[:, :T, idx])


def ddim_sample_loop(
    model_fn: Callable,
    s: DiffusionSchedule,
    shape: tuple,
    rng: jax.Array,
    *,
    noise=None,
    eta: float = 0.0,
    clip_denoised: bool = False,
    mean_type: str = MEAN_START_X,
    var_type: str = VAR_FIXED_SMALL,
    traj_control=None,
    dtype=jnp.float32,
):
    """Full DDIM chain as one ``lax.scan`` (reference :946-1069).

    Returns the final ``pred_xstart`` like the reference's
    ``ddim_sample_loop`` (:997).
    """
    rng, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, shape, dtype) if noise is None else noise
    B = shape[0]
    ts = jnp.arange(s.num_timesteps - 1, -1, -1)

    def body(carry, i):
        img, rng = carry
        rng, step_rng = jax.random.split(rng)
        if traj_control is not None:
            img = _apply_traj_control(img, traj_control)
        t = jnp.full((B,), i, dtype=jnp.int32)
        out = p_mean_variance(
            model_fn, s, img, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
        )
        nxt = ddim_step(s, img, t, out["pred_xstart"], step_rng, eta)
        return (nxt, rng), out["pred_xstart"]

    (_, _), preds = jax.lax.scan(body, (img, rng), ts)
    return preds[-1]


def p_sample_loop(
    model_fn: Callable,
    s: DiffusionSchedule,
    shape: tuple,
    rng: jax.Array,
    *,
    noise=None,
    clip_denoised: bool = False,
    mean_type: str = MEAN_START_X,
    var_type: str = VAR_FIXED_SMALL,
    dtype=jnp.float32,
):
    """Ancestral DDPM chain as one ``lax.scan`` (reference :694-797)."""
    rng, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, shape, dtype) if noise is None else noise
    B = shape[0]
    ts = jnp.arange(s.num_timesteps - 1, -1, -1)

    def body(carry, i):
        img, rng = carry
        rng, step_rng = jax.random.split(rng)
        t = jnp.full((B,), i, dtype=jnp.int32)
        out = p_mean_variance(
            model_fn, s, img, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
        )
        nxt = ddpm_step(s, out, t, step_rng)
        return (nxt, rng), None

    (img, _), _ = jax.lax.scan(body, (img, rng), ts)
    return img


def mse_training_losses(
    model_fn: Callable,
    s: DiffusionSchedule,
    x_start,
    t,
    rng: jax.Array,
    *,
    mean_type: str = MEAN_START_X,
    noise=None,
):
    """Base MSE diffusion loss (reference ``training_losses`` :1106-1187).

    Returns dict with per-sample "mse" plus the raw target/prediction that the
    geometric losses consume downstream (reference :1182-1183).
    """
    if noise is None:
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    x_t = q_sample(s, x_start, t, noise)
    t_orig = s.timestep_map[t]
    model_output = model_fn(x_t, t_orig)

    if mean_type == MEAN_START_X:
        target = x_start
    elif mean_type == MEAN_EPSILON:
        target = noise
    else:
        raise NotImplementedError(mean_type)

    mse = ((target - model_output) ** 2).reshape(x_start.shape[0], -1).mean(axis=-1)
    return {"mse": mse, "target": target, "pred": model_output, "x_t": x_t}
