"""Timestep schedule samplers: uniform + loss-second-moment importance.

Parity source ``/root/reference/src/models/utils/gaussian_diffusion.py``:
``create_named_schedule_sampler``:23, ``UniformSampler``:70,
``LossAwareSampler.update_with_local_losses``:88-119 (the reference's ONLY
raw distributed collective — a ``torch.distributed.all_gather`` syncing loss
histories across DDP ranks), ``LossSecondMomentResampler``:135.

TPU re-design: sampler state is a pytree of arrays carried through the train
step.  Under data-parallel SPMD the per-sample losses are already global
(jit sees the full sharded batch), so the explicit all_gather disappears —
``update`` is a pure scatter into the replicated history.  For explicit
shard_map/pmap training loops, :func:`all_gather_losses` provides the
``lax.all_gather`` equivalent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def uniform_sample(rng, batch: int, num_timesteps: int):
    """Uniform t + importance weights (reference :70-86)."""
    t = jax.random.randint(rng, (batch,), 0, num_timesteps)
    weights = jnp.ones((batch,))
    return t, weights


class LossAwareState(NamedTuple):
    """Replicated loss history per timestep (reference :135-167)."""

    history: jnp.ndarray  # (T, history_size) squared-loss history
    counts: jnp.ndarray   # (T,) filled entries per timestep


def loss_aware_init(num_timesteps: int, history_size: int = 10) -> LossAwareState:
    return LossAwareState(
        history=jnp.zeros((num_timesteps, history_size)),
        counts=jnp.zeros((num_timesteps,), jnp.int32),
    )


def loss_aware_weights(state: LossAwareState, uniform_prob: float = 0.001) -> jnp.ndarray:
    """sqrt(E[loss^2]) importance weights, uniform until warmed up
    (reference :149-160)."""
    T, H = state.history.shape
    warmed = (state.counts == H).all()
    weights = jnp.sqrt((state.history**2).mean(axis=-1))
    weights = weights / weights.sum()
    weights = weights * (1 - uniform_prob) + uniform_prob / T
    uniform = jnp.full((T,), 1.0 / T)
    return jnp.where(warmed, weights, uniform)


def loss_aware_sample(rng, batch: int, state: LossAwareState, uniform_prob: float = 0.001):
    """Importance-sample t; returns (t, 1/(T*p[t])) weights (reference :60-68)."""
    p = loss_aware_weights(state, uniform_prob)
    t = jax.random.choice(rng, p.shape[0], (batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def loss_aware_update(state: LossAwareState, t: jnp.ndarray, losses: jnp.ndarray) -> LossAwareState:
    """Insert per-sample losses into the history (reference :162-175).

    A full history shifts left before appending; a warming history fills the
    next free slot.  Vectorised scatter, one sample at a time via scan (batch
    is small; this stays inside jit).
    """

    def body(carry, tl):
        history, counts = carry
        ti, li = tl
        full = counts[ti] == history.shape[1]

        def when_full(h):
            row = jnp.concatenate([h[ti, 1:], jnp.asarray([li])])
            return h.at[ti].set(row)

        def when_filling(h):
            return h.at[ti, counts[ti]].set(li)

        history = jax.lax.cond(full, when_full, when_filling, history)
        counts = counts.at[ti].set(jnp.minimum(counts[ti] + 1, history.shape[1]))
        return (history, counts), None

    (history, counts), _ = jax.lax.scan(body, (state.history, state.counts), (t, losses))
    return LossAwareState(history, counts)


def all_gather_losses(t: jnp.ndarray, losses: jnp.ndarray, axis_name: str):
    """Explicit cross-device gather for shard_map/pmap loops — the
    ``lax.all_gather`` equivalent of the reference's
    ``dist.all_gather`` (:98-119)."""
    t_all = jax.lax.all_gather(t, axis_name).reshape(-1)
    losses_all = jax.lax.all_gather(losses, axis_name).reshape(-1)
    return t_all, losses_all


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """Factory mirroring the reference's entry point (:23-33).

    Returns ``(init_state, sample_fn, update_fn)``; uniform has trivial
    state (None).
    """
    if name == "uniform":
        return (
            None,
            lambda rng, batch, state=None: uniform_sample(rng, batch, num_timesteps),
            lambda state, t, losses: state,
        )
    if name == "loss-second-moment":
        return (
            loss_aware_init(num_timesteps),
            lambda rng, batch, state: loss_aware_sample(rng, batch, state),
            loss_aware_update,
        )
    raise NotImplementedError(f"unknown schedule sampler: {name}")
