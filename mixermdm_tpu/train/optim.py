"""Optimizers: AdamW + clipping + grad accumulation + cosine warmup.

Reference training config (``/root/reference/configs/train/MixerMDM.yaml``:
lr 1e-5, wd 1e-4, clip 0.5, grad_acc 2; ``scripts/train/mixermdm.py:62-97,
146-207``) and the CosineWarmupScheduler (``models/utils/utils.py:6-20``) map
onto optax transforms; Lightning's manual-optimization plumbing disappears.
"""

from __future__ import annotations

import numpy as np
import optax


def cosine_warmup_schedule(base_lr: float, warmup: int, max_iters: int):
    """lr factor = 0.5*(1+cos(pi*t/T)), linearly scaled during warmup
    (utils.py:12-20)."""

    def schedule(count):
        import jax.numpy as jnp

        t = count.astype(jnp.float32) if hasattr(count, "astype") else float(count)
        factor = 0.5 * (1.0 + jnp.cos(jnp.pi * t / max_iters))
        warm = jnp.minimum((t + 1.0) / warmup, 1.0) if warmup > 0 else 1.0
        return base_lr * factor * warm

    return schedule


def make_adamw(
    lr: float = 1e-5,
    weight_decay: float = 1e-4,
    clip_norm: float | None = 0.5,
    grad_acc_steps: int = 1,
    schedule=None,
    mu_dtype=None,
    nan_guard: int = 0,
) -> optax.GradientTransformation:
    """AdamW + clip + grad accumulation (reference train/mixermdm.py:62-97).

    ``mu_dtype`` stores the first moment in a reduced dtype (e.g. bf16) —
    an HBM-traffic knob for the measured-HBM-bound training step; optax
    casts back to the param dtype inside the update, so the math is the
    standard Adam update on a rounded m.

    ``nan_guard > 0`` adds failure detection the reference lacks (SURVEY §5:
    fault tolerance there is checkpoint-resume only): non-finite gradients
    (NaN/inf from a bad batch or an fp blow-up) skip the update instead of
    poisoning the params/moments — pure in-graph data flow, no host sync
    (``optax.apply_if_finite``).  Any finite step resets the consecutive
    counter; after ``nan_guard`` CONSECUTIVE bad steps the guard stops
    masking and lets the non-finite update through, so a persistent
    divergence fails loudly (NaN loss/params) instead of spinning silently.
    The counter is observable via :func:`notfinite_count`.
    """
    tx = []
    if clip_norm is not None:
        tx.append(optax.clip_by_global_norm(clip_norm))
    tx.append(optax.adamw(schedule if schedule is not None else lr,
                          weight_decay=weight_decay, mu_dtype=mu_dtype))
    opt = optax.chain(*tx)
    if grad_acc_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_acc_steps)
    if nan_guard > 0:
        opt = optax.apply_if_finite(opt, max_consecutive_errors=nan_guard)
    return opt


def notfinite_count(opt_state):
    """The nan-guard's consecutive-non-finite-step counter (0 when the guard
    is off or the state has no counter)."""
    if isinstance(opt_state, optax.ApplyIfFiniteState):
        return opt_state.notfinite_count
    return 0
