"""Trainers: adversarial mixer training + base diffusion-model training.

Reference harness (``/root/reference/src/scripts/train/mixermdm.py:29-343``):
PyTorch-Lightning module with manual optimization, two AdamW optimizers,
per-batch generator step + every-N discriminator step, grad accumulation,
0.5-norm clipping, DDP/NCCL.  Here each step is a pure jitted function over a
``jax.sharding.Mesh`` (params replicated, batch data-sharded; XLA inserts the
gradient psum) and the generator/discriminator freeze alternation is
expressed by taking grads only w.r.t. that side's param subtree — no
requires_grad mutation (mixermdm.py:403-431).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .optim import make_adamw

GEN_KEYS = ("core", "text")          # + the mixer's CLIP post-encoder head
DISC_KEYS = ("disc_i", "disc_I")

# Attention implementation for the DIFFERENTIATED training graph, measured
# at the production sizes (B=32, T=300, fused G+D step, one v5e chip):
#   "xla"    : 599 ms  — XLA attention fwd+bwd (fastest; XLA fuses the remat
#                        recompute into the backward)
#   "pallas" : 622 ms  — Pallas fwd + hand-written multi-head bwd kernel
#                        (was 764 ms with single-head bwd programs)
# Sampling always keeps the Pallas kernels (they win there, see BASELINE.md).
TRAIN_ATTENTION = "xla"


def set_train_attention(impl: str) -> None:
    global TRAIN_ATTENTION
    assert impl in ("xla", "pallas")
    TRAIN_ATTENTION = impl


class MixerTrainState(NamedTuple):
    params: Any
    opt_gen: Any
    opt_disc: Any
    step: jnp.ndarray


def _subset(params: dict, keys) -> dict:
    """Trainable subtree extraction.  Within a "text" pipeline subtree only
    the post-encoder heads train — the CLIP tower is frozen (the reference's
    generator optimizer lists only positional_embedding/clipTransEncoder/
    clip_ln, scripts/train/mixermdm.py:67-71; elsewhere torch's AdamW skips
    grad-less frozen params).  Excluding it here avoids ~700 MB of Adam
    moments for the tower AND stops AdamW weight decay from eroding frozen
    CLIP weights."""
    out = {}
    for k in keys:
        v = params[k]
        if k == "text" and isinstance(v, dict) and "clip" in v:
            out[k] = {n: p for n, p in v.items() if n != "clip"}
        else:
            out[k] = v
    return out


def _trace_train_grads(loss_fn, train_params):
    """value_and_grad under the training attention config: the VJP-less
    fused sub-block kernels are always off; Pallas attention (which has the
    hand-written backward kernel) only if ``TRAIN_ATTENTION == "pallas"``."""
    from ..models import layers as _L

    _old_fb = _L._FUSED_BLOCKS
    _old_pa = _L._PALLAS_ATTENTION
    _L.set_fused_blocks(False)
    if TRAIN_ATTENTION == "xla":
        _L.set_pallas_attention(False)
    try:
        return jax.value_and_grad(loss_fn, has_aux=True)(train_params)
    finally:
        _L.set_fused_blocks(_old_fb)
        _L.set_pallas_attention(_old_pa)


def _merge(params: dict, sub: dict) -> dict:
    out = dict(params)
    for k, v in sub.items():
        base = params.get(k)
        if k == "text" and isinstance(base, dict) and "clip" in base:
            out[k] = {**base, **v}
        else:
            out[k] = v
    return out


class MixerTrainer:
    """Adversarial trainer for :class:`~mixermdm_tpu.systems.MixerMDMSystem`."""

    def __init__(
        self,
        system,
        lr: float = 1e-5,
        weight_decay: float = 1e-4,
        clip_norm: float = 0.5,
        grad_acc_steps: int = 2,
        discriminator_steps: int = 1,
        i_loss_factor: float = 1.0,
        I_loss_factor: float = 2.0,
        l1: float = 0.1,
        mesh=None,
        donate: bool = False,
        mu_dtype=None,
        nan_guard: int = 0,
    ):
        self.system = system
        self.discriminator_steps = discriminator_steps
        self.loss_kw = dict(
            i_loss_factor=i_loss_factor, I_loss_factor=I_loss_factor, l1=l1
        )
        # nan_guard > 0: non-finite G or D gradients skip that side's update
        # in-graph instead of poisoning params/moments (see optim.make_adamw).
        self.opt_gen = make_adamw(lr, weight_decay, clip_norm, grad_acc_steps,
                                  mu_dtype=mu_dtype, nan_guard=nan_guard)
        self.opt_disc = make_adamw(lr, weight_decay, clip_norm, grad_acc_steps,
                                   mu_dtype=mu_dtype, nan_guard=nan_guard)
        self.mesh = mesh

        # Sharding rides on the arguments: callers place the batch with
        # ``parallel.mesh.shard_batch`` and params with ``replicate`` — jit
        # then compiles an SPMD program with the gradient psum over ICI.
        # ``donate=True`` donates the state: params + both optimizer trees
        # update in place instead of allocating a second copy each step
        # (measured 599 -> 587 ms at full size).  The training CLIs enable
        # it; it stays opt-in because a donated state's buffers are dead
        # after the call — interactive/test code often reuses them.
        dn = dict(donate_argnums=(0,)) if donate else {}
        self._gen_step = jax.jit(partial(self._step, mode="generator"), **dn)
        self._disc_step = jax.jit(partial(self._step, mode="discriminator"), **dn)
        # Fused G(+D) program: ONE dispatch per batch (per-step Python
        # dispatch over the device tunnel is pure overhead — SURVEY §7's
        # "three-network GAN" hard part).  ``do_disc`` is static, so at most
        # two traces exist (G-only and G+D).
        self._fused_step = {
            True: jax.jit(partial(self._fused, do_disc=True), **dn),
            False: jax.jit(partial(self._fused, do_disc=False), **dn),
        }

    def init_state(self, params) -> MixerTrainState:
        return MixerTrainState(
            params=params,
            opt_gen=self.opt_gen.init(_subset(params, GEN_KEYS)),
            opt_disc=self.opt_disc.init(_subset(params, DISC_KEYS)),
            step=jnp.zeros((), jnp.int32),
        )

    def _step(self, state: MixerTrainState, batch: dict, rng, *, mode: str):
        from ..utils.alignment import geometry_batch_scope

        with geometry_batch_scope(self.mesh):
            return self._step_body(state, batch, rng, mode=mode)

    def _step_body(self, state: MixerTrainState, batch: dict, rng, *, mode: str):
        sys = self.system
        keys = GEN_KEYS if mode == "generator" else DISC_KEYS
        opt = self.opt_gen if mode == "generator" else self.opt_disc
        opt_state = state.opt_gen if mode == "generator" else state.opt_disc

        def loss_fn(train_params):
            p = _merge(state.params, train_params)
            cond = sys.encode_cond(
                p, batch["tokens_inter"], batch["tokens_i1"], batch["tokens_i2"]
            )
            losses = sys._loss_impl(
                p, batch["motions"], batch["motion_lens"], cond, rng,
                mode=mode, cond_mask_prob=0.1, **self.loss_kw,
            )
            return losses["total"], losses

        train_params = _subset(state.params, keys)
        (loss, losses), grads = _trace_train_grads(loss_fn, train_params)
        updates, new_opt_state = opt.update(grads, opt_state, train_params)
        new_params = _merge(state.params, optax.apply_updates(train_params, updates))

        if mode == "generator":
            new_state = state._replace(
                params=new_params, opt_gen=new_opt_state, step=state.step + 1
            )
        else:
            new_state = state._replace(params=new_params, opt_disc=new_opt_state)
        return new_state, losses

    def _fused(self, state, batch, rng, *, do_disc: bool):
        rng_g, rng_d = jax.random.split(rng)
        state, g_losses = self._step(state, batch, rng_g, mode="generator")
        d_losses = None
        if do_disc:
            state, d_losses = self._step(state, batch, rng_d, mode="discriminator")
        return state, g_losses, d_losses

    def generator_step(self, state, batch, rng):
        return self._gen_step(state, batch, rng)

    def discriminator_step(self, state, batch, rng):
        return self._disc_step(state, batch, rng)

    def fit_step(self, state: MixerTrainState, batch: dict, rng, batch_idx: int):
        """One harness step: G every batch, D every ``discriminator_steps``
        (scripts/train/mixermdm.py:146-207) — compiled as ONE program."""
        do_disc = batch_idx % self.discriminator_steps == 0
        return self._fused_step[do_disc](state, batch, rng)


class BaseTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    sampler_state: Any = None   # loss-aware schedule-sampler history (or None)


class BaseTrainer:
    """MSE+geometric trainer for In2IN / MDM / InterGen systems
    (reference scripts/train/{in2IN,mdm}.py).

    ``sampler`` wires the SAMPLER config (reference in2in.py:152,225 —
    ``create_named_schedule_sampler``): "uniform" (default) or
    "loss-second-moment".  The loss-aware history updates from the
    per-sample MSE each step; under data-parallel SPMD jit already sees the
    global batch, so no explicit all_gather is needed (the reference's
    ``dist.all_gather`` at gaussian_diffusion.py:98-119 —
    ``diffusion.samplers.all_gather_losses`` exists for shard_map loops).

    ``lr_schedule`` (an optax schedule fn) replaces the constant lr — used
    for the reference's CosineWarmupScheduler in interaction training
    (scripts/train/in2IN.py:51-58).
    """

    def __init__(
        self,
        system,
        lr: float = 1e-4,
        weight_decay: float = 2e-5,
        clip_norm: Optional[float] = None,
        grad_acc_steps: int = 1,
        mesh=None,
        train_text_head: bool = True,
        sampler: Optional[str] = None,
        lr_schedule=None,
        donate: bool = False,
        nan_guard: int = 0,
    ):
        from ..diffusion.samplers import create_named_schedule_sampler

        self.system = system
        self.train_text_head = train_text_head
        self.opt = make_adamw(lr, weight_decay, clip_norm, grad_acc_steps,
                              schedule=lr_schedule, nan_guard=nan_guard)
        self.mesh = mesh
        self._donate = donate

        name = sampler
        if name is None:
            cfg = getattr(system, "cfg", None)
            name = cfg.get("SAMPLER", "uniform") if cfg is not None else "uniform"
        self.sampler_name = name
        (self._sampler_state0, self._sample_t,
         self._sampler_update) = create_named_schedule_sampler(
            name, system.train_schedule.num_timesteps
        )

        self._jit_step = jax.jit(
            self._step, **(dict(donate_argnums=(0,)) if donate else {})
        )

    def _trainable_keys(self, params):
        keys = [k for k in params if k.startswith("denoiser")]
        if self.train_text_head and "text" in params:
            keys.append("text")
        if self.train_text_head and "embed_text" in params:
            keys.append("embed_text")
        return tuple(keys)

    def init_state(self, params) -> BaseTrainState:
        return BaseTrainState(
            params=params,
            opt_state=self.opt.init(_subset(params, self._trainable_keys(params))),
            step=jnp.zeros((), jnp.int32),
            sampler_state=self._sampler_state0,
        )

    def _step(self, state: BaseTrainState, batch: dict, rng):
        sys = self.system
        keys = self._trainable_keys(state.params)
        token_keys = [k for k in batch if k.startswith("tokens")]

        B = batch["motions"].shape[0]
        rng, rng_t = jax.random.split(rng)
        # Schedule-sampler draw (the reference discards the importance
        # weights — in2in.py:265 `t, _ = self.sampler.sample(...)`).
        t, _weights = self._sample_t(rng_t, B, state.sampler_state)

        def loss_fn(train_params):
            p = _merge(state.params, train_params)
            cond = sys.encode_cond_tokens(p, {k: batch[k] for k in token_keys})
            losses = sys.compute_loss(
                p, batch["motions"], batch["motion_lens"], cond, rng, t=t
            )
            return losses["total"], losses

        train_params = _subset(state.params, keys)
        (loss, losses), grads = _trace_train_grads(loss_fn, train_params)
        updates, new_opt = self.opt.update(grads, state.opt_state, train_params)
        new_params = _merge(state.params, optax.apply_updates(train_params, updates))
        new_sampler_state = self._sampler_update(
            state.sampler_state, t, losses.get("mse_per_sample", jnp.zeros((B,)))
        )
        return (
            BaseTrainState(new_params, new_opt, state.step + 1, new_sampler_state),
            losses,
        )

    def step(self, state, batch, rng):
        return self._jit_step(state, batch, rng)
