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
MEAN_PREVIOUS_X = "previous_x"

VAR_FIXED_SMALL = "fixed_small"
VAR_FIXED_LARGE = "fixed_large"
VAR_LEARNED = "learned"
VAR_LEARNED_RANGE = "learned_range"

LEARNED_VAR_TYPES = (VAR_LEARNED, VAR_LEARNED_RANGE)


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


def predict_xstart_from_xprev(s: DiffusionSchedule, x_t, t, xprev):
    """x0 implied by a model that predicts x_{t-1} (reference :547-556):
    (xprev - coef2 * x_t) / coef1."""
    nd = x_t.ndim
    return (
        extract(1.0 / s.posterior_mean_coef1, t, nd) * xprev
        - extract(s.posterior_mean_coef2 / s.posterior_mean_coef1, t, nd) * x_t
    )


def split_learned_variance(s: DiffusionSchedule, model_output, t, var_type: str):
    """Split a 2F-channel model output into (prediction, variance stats).

    Reference :477-490 splits at dim 1 (image NCHW layout); motion tensors
    here are (B, T, F) so the split is on the FEATURE (last) axis.  LEARNED
    uses the second half as log-variance directly; LEARNED_RANGE interpolates
    in [posterior_log_variance_clipped, log(betas)] with the second half
    mapped from [-1, 1] to [0, 1].
    """
    F2 = model_output.shape[-1]
    model_output, var_values = jnp.split(model_output, 2, axis=-1)
    nd = model_output.ndim
    if var_type == VAR_LEARNED:
        log_variance = var_values
    else:
        min_log = extract(s.posterior_log_variance_clipped, t, nd)
        max_log = extract(s.log_betas, t, nd)
        frac = (var_values + 1.0) / 2.0
        log_variance = frac * max_log + (1.0 - frac) * min_log
    return model_output, jnp.exp(log_variance), log_variance


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

    if var_type in LEARNED_VAR_TYPES:
        model_output, variance, log_variance = split_learned_variance(
            s, model_output, t, var_type
        )
    else:
        variance, log_variance = model_variance(s, t, x.ndim, var_type)

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    if mean_type == MEAN_PREVIOUS_X:
        # Model predicts x_{t-1} directly: the mean IS the output
        # (reference :513-517).
        pred_xstart = process_xstart(predict_xstart_from_xprev(s, x, t, model_output))
        mean = model_output
    elif mean_type in (MEAN_START_X, MEAN_EPSILON):
        if mean_type == MEAN_START_X:
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(predict_xstart_from_eps(s, x, t, model_output))
        mean, _, _ = q_posterior_mean_variance(s, pred_xstart, x, t)
    else:
        raise NotImplementedError(mean_type)

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
    """Pin root-trajectory dims from x_start each step (reference :1052-1055).

    Person-2's dims [262, 264] are pinned only when the motion is wide
    enough (two-person layouts); jnp would otherwise silently CLAMP the
    out-of-bounds indices onto the wrong feature.
    """
    T = img.shape[1]
    D = img.shape[2]
    idx = jnp.asarray([i for i in (0, 2, 262, 264) if i < D])
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
    cond_fn: Callable | None = None,
    skip_timesteps: int = 0,
    init_image=None,
    dtype=jnp.float32,
):
    """Full DDIM chain as one ``lax.scan`` (reference :946-1069).

    Returns the final ``pred_xstart`` like the reference's
    ``ddim_sample_loop`` (:997).  ``cond_fn(x, t_orig) -> grad log p(y|x)``
    applies Song-style score conditioning each step (reference ddim_sample
    :822 -> condition_score :584).

    Warm start (reference :1031-1038): ``skip_timesteps`` drops the first
    steps of the (respaced) chain and ``init_image`` is q-sampled to the
    first remaining timestep using the initial noise draw as the noise
    (``skip_timesteps`` with no image implies a zero image).
    """
    if cond_fn is not None:
        from .guidance import condition_score
    rng, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, shape, dtype) if noise is None else noise
    B = shape[0]
    n_eff = s.num_timesteps - int(skip_timesteps)
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, dtype)
    if init_image is not None:
        t0 = jnp.full((B,), n_eff - 1, jnp.int32)
        img = q_sample(s, init_image.astype(dtype), t0, img)
    ts = jnp.arange(n_eff - 1, -1, -1)

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
        if cond_fn is not None:
            out = condition_score(cond_fn, s, out, img, t)
        nxt = ddim_step(s, img, t, out["pred_xstart"], step_rng, eta)
        return (nxt, rng), out["pred_xstart"]

    (_, _), preds = jax.lax.scan(body, (img, rng), ts)
    return preds[-1]


def dpmpp_coefficients(s: DiffusionSchedule, n_eff: int | None = None):
    """Host-side DPM-Solver++(2M) coefficient tables for a (respaced) chain.

    Returns ``(sig_ratio, alp_next, phi, c2)``, each of length ``n_eff``
    (default ``s.num_timesteps``; pass fewer for a warm-started chain that
    skips the head), indexed by scan position ``j`` (position ``j``
    visits chain index ``i = n_eff-1-j``; its "next" point is ``i-1``, with
    the ``i = -1`` boundary being clean data: alpha=1, sigma=0, lambda=+inf).
    The VP data-prediction update (Lu et al., arXiv:2211.01095) is

        x_next = sig_ratio * x - alp_next * phi * D,
        D      = (1 + c2) * x0_cur - c2 * x0_prev,

    with ``phi = e^{-h} - 1`` and ``c2 = h_j / (2 h_{j-1})`` (the 2M
    multistep correction).  The first step has no history and the final
    step is forced first-order (``c2 = 0`` — "lower-order final", which
    also keeps the mixer's t==0 raw-space x0 quirk out of the correction).
    Computed in f64 on host once per trace; no reference equivalent
    (TPU-native addition — the reference only ships DDPM/DDIM loops).
    """
    import numpy as np

    acp = np.asarray(s.alphas_cumprod, np.float64)
    n = acp.shape[0] if n_eff is None else int(n_eff)
    alpha = np.sqrt(acp)
    sigma = np.sqrt(1.0 - acp)
    lam = 0.5 * (np.log(acp) - np.log1p(-acp))
    i_cur = np.arange(n - 1, -1, -1)
    has_next = i_cur > 0
    i_nxt = np.maximum(i_cur - 1, 0)
    sig_ratio = np.where(has_next, sigma[i_nxt], 0.0) / sigma[i_cur]
    alp_next = np.where(has_next, alpha[i_nxt], 1.0)
    with np.errstate(invalid="ignore"):
        h = np.where(has_next, lam[i_nxt] - lam[i_cur], np.inf)
    phi = np.expm1(-h)  # -> -1 at the clean-data boundary
    c2 = np.zeros(n)
    if n > 1:
        with np.errstate(invalid="ignore"):
            c2[1:] = h[1:] / (2.0 * h[:-1])
    c2[~np.isfinite(c2)] = 0.0
    c2[-1] = 0.0

    def f32(a):
        return jnp.asarray(a, jnp.float32)

    return f32(sig_ratio), f32(alp_next), f32(phi), f32(c2)


def dpmpp_sample_loop(
    model_fn: Callable,
    s: DiffusionSchedule,
    shape: tuple,
    rng: jax.Array,
    *,
    noise=None,
    clip_denoised: bool = False,
    mean_type: str = MEAN_START_X,
    var_type: str = VAR_FIXED_SMALL,
    traj_control=None,
    skip_timesteps: int = 0,
    init_image=None,
    dtype=jnp.float32,
):
    """DPM-Solver++(2M) chain as one ``lax.scan`` — x0-prediction form.

    A second-order multistep probability-flow ODE solver over the same
    respaced schedule as :func:`ddim_sample_loop`: typically matches
    DDIM-50 quality in ~half the model calls (see
    ``scripts/sampler_ab.py`` for the distribution-level gate).  Fully
    deterministic — ``rng`` is consumed only for the initial noise draw.
    ``skip_timesteps``/``init_image`` warm-start exactly like the DDIM
    loop (q-sample the init image to the first remaining timestep).
    No reference equivalent (the reference ships only DDPM/DDIM loops).
    """
    rng, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, shape, dtype) if noise is None else noise
    B = shape[0]
    n = s.num_timesteps - int(skip_timesteps)
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, dtype)
    if init_image is not None:
        t0 = jnp.full((B,), n - 1, jnp.int32)
        img = q_sample(s, init_image.astype(dtype), t0, img)
    sig_ratio, alp_next, phi, c2 = dpmpp_coefficients(s, n)

    def body(carry, xs):
        img, prev_x0 = carry
        i, j = xs
        if traj_control is not None:
            img = _apply_traj_control(img, traj_control)
        t = jnp.full((B,), i, dtype=jnp.int32)
        out = p_mean_variance(
            model_fn, s, img, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
        )
        x0 = out["pred_xstart"]
        d = (1.0 + c2[j]) * x0 - c2[j] * prev_x0
        nxt = sig_ratio[j] * img - alp_next[j] * phi[j] * d
        return (nxt, x0), x0

    ts = jnp.arange(n - 1, -1, -1)
    (_, _), preds = jax.lax.scan(
        body, (img, jnp.zeros_like(img)), (ts, jnp.arange(n))
    )
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
    cond_fn: Callable | None = None,
    pre_seq=None,
    transl_req=None,
    transl_dims=(0, 2),
    dtype=jnp.float32,
):
    """Ancestral DDPM chain as one ``lax.scan`` (reference :694-797).

    ``cond_fn`` applies the Sohl-Dickstein mean shift each step (reference
    p_sample :656 -> condition_mean :569).

    Inpainting controls, applied to the loop state before each model call
    exactly as the reference's ``p_sample`` does (:662-673): ``pre_seq``
    (B, T_pre, F) q-samples the clean prefix to the current noise level and
    overwrites the first frames; ``transl_req`` — a static sequence of
    ``(frame, tx, tz)`` — pins the root XZ translation at those frames.
    (The reference's literal indexing assumes its MDM-ancestor (B, J, F, T)
    layout; here the same operations act on the (B, T, F) motion layout.)
    """
    if cond_fn is not None:
        from .guidance import condition_mean
    if pre_seq is not None or transl_req is not None:
        from .guidance import apply_prefix_inpainting, apply_translation_pinning
    rng, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, shape, dtype) if noise is None else noise
    B = shape[0]
    ts = jnp.arange(s.num_timesteps - 1, -1, -1)

    def body(carry, i):
        img, rng = carry
        rng, step_rng = jax.random.split(rng)
        t = jnp.full((B,), i, dtype=jnp.int32)
        if pre_seq is not None:
            rng, seq_rng = jax.random.split(rng)
            img = apply_prefix_inpainting(s, img, t, pre_seq.astype(dtype), seq_rng)
        if transl_req is not None:
            rng, pin_rng = jax.random.split(rng)
            img = apply_translation_pinning(
                s, img, t, transl_req, pin_rng, dims=transl_dims
            )
        out = p_mean_variance(
            model_fn, s, img, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
        )
        if cond_fn is not None:
            out = dict(out, mean=condition_mean(cond_fn, s, out, img, t))
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
    var_type: str = VAR_FIXED_SMALL,
    rescale_vb: bool = False,
    noise=None,
):
    """Base MSE diffusion loss (reference ``training_losses`` :1106-1187).

    Returns dict with per-sample "mse" plus the raw target/prediction that the
    geometric losses consume downstream (reference :1182-1183).  With a
    LEARNED variance type the output carries 2F channels; the variance half
    trains through a frozen-mean VLB term "vb" (reference :1145-1160), and
    "loss" = mse + vb.
    """
    if noise is None:
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    x_t = q_sample(s, x_start, t, noise)
    t_orig = s.timestep_map[t]
    model_output = model_fn(x_t, t_orig)

    terms = {}
    if var_type in LEARNED_VAR_TYPES:
        model_output, var_values = jnp.split(model_output, 2, axis=-1)
        # Stop-gradient the mean half so the VLB trains only the variance
        # (reference's frozen_out trick, :1149-1152).
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(model_output), var_values], axis=-1
        )
        from .vlb import vb_terms_bpd

        terms["vb"] = vb_terms_bpd(
            lambda _x, _t: frozen, s, x_start, x_t, t,
            clip_denoised=False, mean_type=mean_type, var_type=var_type,
        )["output"]
        if rescale_vb:
            terms["vb"] = terms["vb"] * (s.num_timesteps / 1000.0)

    if mean_type == MEAN_START_X:
        target = x_start
    elif mean_type == MEAN_EPSILON:
        target = noise
    elif mean_type == MEAN_PREVIOUS_X:
        target = q_posterior_mean_variance(s, x_start, x_t, t)[0]
    else:
        raise NotImplementedError(mean_type)

    mse = ((target - model_output) ** 2).reshape(x_start.shape[0], -1).mean(axis=-1)
    terms.update({"mse": mse, "target": target, "pred": model_output, "x_t": x_t})
    terms["loss"] = mse + terms["vb"] if "vb" in terms else mse
    return terms
