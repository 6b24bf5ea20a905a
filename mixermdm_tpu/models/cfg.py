"""Classifier-free-guidance wrappers as batched pure functions.

Parity source ``/root/reference/src/models/utils/cfg_sampler.py``:
``ClassifierFreeSampleModel``:5 (2x batch), ``ClassifierFreeSampleModelX2``:31
(2x batch, dual latent stream), ``ClassifierFreeSampleModelMultiple``:59
(4x batch: full / interaction-only / individuals-only / uncond),
``ClassifierFreeSampleDualMDM``:97 (two frozen models + t-dependent blend).

The reference already expresses CFG as a single batched forward, which maps
1:1 onto jit — each wrapper here returns a closure suitable for the diffusion
drivers.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def cfg_model(model_fn: Callable, scale: float) -> Callable:
    """``s*cond + (1-s)*uncond`` over a doubled batch (cfg_sampler.py:5-28).

    ``model_fn(x, t, mask, cond)``; returns ``fn(x, t, mask, cond)``.
    """

    def fn(x, timesteps, mask=None, cond=None):
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([timesteps, timesteps], axis=0)
        c2 = None if cond is None else jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        m2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
        out = model_fn(x2, t2, m2, c2)
        return scale * out[:B] + (1.0 - scale) * out[B:]

    return fn


def cfg_model_x2(mixer_fn: Callable, scale: float, with_influence: bool = False) -> Callable:
    """CFG threading the second latent stream for the Mixer
    (cfg_sampler.py:31-56).

    ``mixer_fn(x, x2, t, mask, cond) -> mixed`` (eval-mode Mixer output);
    returns ``fn(x, x2, t, mask, cond)``.  With ``with_influence`` the
    mixer_fn must return ``(mixed, (infl1, infl2))`` and the wrapper returns
    the CFG output plus the *conditioned-branch* influences — so influence
    histories cost nothing extra (the reference logs the same conditioned
    pass, mixermdm.py:794-796).
    """

    def fn(x, x2, timesteps, mask=None, cond=None):
        B = x.shape[0]
        xa = jnp.concatenate([x, x], axis=0)
        xb = jnp.concatenate([x2, x2], axis=0)
        t2 = jnp.concatenate([timesteps, timesteps], axis=0)
        c2 = None if cond is None else jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        m2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
        if with_influence:
            out, (infl1, infl2) = mixer_fn(xa, xb, t2, m2, c2)
            cfg_out = scale * out[:B] + (1.0 - scale) * out[B:]
            return cfg_out, (infl1[:B], infl2[:B])
        out = mixer_fn(xa, xb, t2, m2, c2)
        return scale * out[:B] + (1.0 - scale) * out[B:]

    return fn


def cfg_model_multiple(
    model_fn: Callable, scale: float, scale_interaction: float, scale_individuals: float,
    text_dim: int = 768,
) -> Callable:
    """4x-batch CFG for in2IN interaction (cfg_sampler.py:59-94):
    full / interaction-only / individuals-only / unconditioned."""

    def fn(x, timesteps, mask=None, cond=None):
        B = x.shape[0]
        x4 = jnp.concatenate([x] * 4, axis=0)
        t4 = jnp.concatenate([timesteps] * 4, axis=0)
        cond_interaction = jnp.zeros_like(cond).at[:, :text_dim].set(cond[:, :text_dim])
        cond_individuals = jnp.zeros_like(cond).at[:, text_dim:].set(cond[:, text_dim:])
        c4 = jnp.concatenate(
            [cond, cond_interaction, cond_individuals, jnp.zeros_like(cond)], axis=0
        )
        m4 = None if mask is None else jnp.concatenate([mask] * 4, axis=0)
        out = model_fn(x4, t4, m4, c4)
        o_full, o_inter, o_ind, o_un = out[:B], out[B : 2 * B], out[2 * B : 3 * B], out[3 * B :]
        return (
            scale * o_full
            + scale_interaction * o_inter
            + scale_individuals * o_ind
            + (1.0 - (scale + scale_interaction + scale_individuals)) * o_un
        )

    return fn


def dual_mdm_weight_fn(func: str, value: float) -> Callable:
    """t-dependent composition weight schedules (cfg_sampler.py:108-120)."""
    if func == "exp":
        return lambda t: jnp.exp(-value * (1000.0 - t))
    if func == "exp-inv":
        return lambda t: 1.0 - jnp.exp(-value * (1000.0 - t))
    if func == "lin":
        return lambda t: 1.0 - (1000.0 - t) / 1000.0
    if func == "const":
        return lambda t: jnp.asarray(value)
    raise ValueError(f"unknown weight function {func}")


def cfg_dual_mdm(
    individual_fn: Callable,
    interaction_fn: Callable,
    s_individual: float,
    s_interaction: float,
    w_func: str,
    w_value: float,
) -> Callable:
    """DualMDM fixed-schedule composition baseline (cfg_sampler.py:97-150).

    Runs BOTH frozen denoisers at 2x batch, per-model CFG, then blends with
    the t-dependent weight — the baseline MixerMDM learns to beat.
    """
    w_of_t = dual_mdm_weight_fn(w_func, w_value)

    def fn(x, timesteps, mask=None, cond=None):
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([timesteps, timesteps], axis=0)
        c2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        m2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)

        out_inter = interaction_fn(x2, t2, m2, c2)
        out_ind = individual_fn(x2, t2, m2, c2)

        cfg_inter = out_inter[B:] + s_interaction * (out_inter[:B] - out_inter[B:])
        cfg_ind = out_ind[B:] + s_individual * (out_ind[:B] - out_ind[B:])

        # Reference indexes the first batch element's timestep (:148).
        w = w_of_t(timesteps[0].astype(jnp.float32))
        return cfg_inter + w * (cfg_ind - cfg_inter)

    return fn
