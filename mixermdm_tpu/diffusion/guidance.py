"""Classifier guidance + DDIM reverse ODE + inpainting controls.

Parity source ``/root/reference/src/models/utils/gaussian_diffusion.py``:
``condition_mean``:569 (Sohl-Dickstein-style mean shift),
``condition_score``:584 (Song-style score conditioning),
``ddim_reverse_sample``:908 (deterministic encode), the ``pre_seq``
prefix-inpainting and ``transl_req`` translation pinning in ``p_sample``
(:662-673), and ``skip_timesteps``/``init_image`` warm starts (:1031-1038).

All pure functions over :class:`DiffusionSchedule`; ``cond_fn`` is any
callable ``(x, t_orig) -> grad log p(y|x)``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .gaussian import (
    extract,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
    q_sample,
)
from .schedule import DiffusionSchedule


def condition_mean(cond_fn: Callable, s: DiffusionSchedule, p_out: dict, x, t):
    """Shift the posterior mean by variance * grad (reference :569-582)."""
    t_orig = s.timestep_map[t]
    gradient = cond_fn(x, t_orig)
    return p_out["mean"] + p_out["variance"] * gradient


def condition_score(cond_fn: Callable, s: DiffusionSchedule, p_out: dict, x, t):
    """Condition the implied score; re-derive x0 and mean (reference :584-606)."""
    t_orig = s.timestep_map[t]
    alpha_bar = extract(s.alphas_cumprod, t, x.ndim)
    eps = predict_eps_from_xstart(s, x, t, p_out["pred_xstart"])
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, t_orig)
    pred_xstart = predict_xstart_from_eps(s, x, t, eps)
    mean, _, _ = q_posterior_mean_variance(s, pred_xstart, x, t)
    out = dict(p_out)
    out["pred_xstart"] = pred_xstart
    out["mean"] = mean
    return out


def ddim_reverse_step(s: DiffusionSchedule, x, t, pred_xstart):
    """x_t -> x_{t+1} along the deterministic reverse ODE (reference :908-944)."""
    nd = x.ndim
    eps = predict_eps_from_xstart(s, x, t, pred_xstart)
    alpha_bar_next = extract(s.alphas_cumprod_next, t, nd)
    return pred_xstart * jnp.sqrt(alpha_bar_next) + jnp.sqrt(1 - alpha_bar_next) * eps


def ddim_encode_loop(
    model_fn: Callable,
    s: DiffusionSchedule,
    x0: jnp.ndarray,
    *,
    mean_type: str = "start_x",
):
    """Encode a clean sample to the chain's terminal latent by scanning the
    reverse ODE forward over timesteps."""
    B = x0.shape[0]
    ts = jnp.arange(0, s.num_timesteps)

    def body(x, i):
        t = jnp.full((B,), i, jnp.int32)
        t_orig = s.timestep_map[t]
        model_output = model_fn(x, t_orig)
        pred_x0 = (
            model_output if mean_type == "start_x"
            else predict_xstart_from_eps(s, x, t, model_output)
        )
        return ddim_reverse_step(s, x, t, pred_x0), None

    x_T, _ = jax.lax.scan(body, x0, ts)
    return x_T


def apply_prefix_inpainting(s: DiffusionSchedule, x, t, pre_seq, rng):
    """Overwrite the first ``pre_seq`` frames with a q-sampled noisy version
    of the prefix each step (reference p_sample ``pre_seq``, :662-666)."""
    T_pre = pre_seq.shape[1]
    noise = jax.random.normal(rng, pre_seq.shape, pre_seq.dtype)
    x_pre = q_sample(s, pre_seq, t, noise)
    return x.at[:, :T_pre].set(x_pre)


def apply_translation_pinning(
    s: DiffusionSchedule, x, t, transl_req: Sequence, rng, dims=(0, 2)
):
    """Pin root translation at requested frames (reference :668-673).

    ``transl_req``: sequence of (frame_idx, tx, tz).  The two q-sampled
    values are written to feature ``dims`` at each requested frame; the
    default (0, 2) is the root XZ position in this framework's (B, T, 262·P)
    motion layout.  (The reference writes its first two feature rows —
    ``x[:, :2, frame]`` — an indexing inherited from its MDM ancestor's
    transposed layout.)
    """
    for i, (frame, tx, tz) in enumerate(transl_req):
        step_rng = jax.random.fold_in(rng, i)
        noise = jax.random.normal(step_rng, (2,), x.dtype)
        target = jnp.asarray([tx, tz], x.dtype)
        noisy = (
            extract(s.sqrt_alphas_cumprod, t, 1)[0] * target
            + extract(s.sqrt_one_minus_alphas_cumprod, t, 1)[0] * noise
        )
        x = x.at[:, frame, jnp.asarray(list(dims))].set(noisy)
    return x


def warm_start_noise(
    s: DiffusionSchedule, init_image, rng, shape, skip_timesteps: int = 0
):
    """skip_timesteps/init_image warm start (reference :1031-1038): q-sample
    the init image to the first remaining timestep."""
    noise = jax.random.normal(rng, shape, init_image.dtype)
    B = shape[0]
    t0 = jnp.full((B,), s.num_timesteps - skip_timesteps - 1, jnp.int32)
    return q_sample(s, init_image, t0, noise)
