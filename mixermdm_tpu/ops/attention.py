"""Pallas TPU kernel: fused multi-head attention with zero-attn semantics.

The hot path of every denoiser layer (SURVEY.md §3.1: ~8 layers x 3
attention ops per DDIM step, T<=300).  The reference relies on torch
``nn.MultiheadAttention`` CUDA kernels; here one Pallas program per
(batch, head) computes ``softmax(QK^T * scale + bias) V`` entirely in VMEM:
both matmuls hit the MXU, the softmax stays on the VPU, and Q/K/V make a
single HBM round trip instead of materialising logits/probabilities in HBM.

``add_zero_attn`` (torch appends an always-attendable zero K/V token —
layers.py:33-44 in the reference) is implemented *algebraically*: the zero
token contributes ``exp(0 - row_max)`` to the softmax denominator and
nothing to the numerator, so the kernel just adds that term — no concat, no
extra memory.

Masks are carried as a per-batch key-bias row (B, 1, Tk) shared by all heads
and query rows (not a (B*H, Tq, Tk) tensor — that would be ~150 MB of HBM
traffic per call at production sizes), plus an optional shared (Tq, Tk)
additive mask (causal CLIP).

Sequence lengths here are small (<=300 frames), so a single-block design
(whole T x T logits in VMEM, padded to lane multiples) beats a flash-style
K-loop: at T=384 the biggest buffer is 384x384 f32 = 576 KiB, far under the
~16 MiB VMEM budget, and there is no loop overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Test hook: force interpret-mode execution of the kernel (lets the CPU test
# mesh exercise the full Pallas path, including its custom_vjp dispatch).
FORCE_INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_body(q_ref, k_ref, v_ref, kbias_ref, qkbias_ref, out_ref, *, scale, zero_attn):
    """Multi-head program body: blocks carry HB heads — (1, HB, Tq, D).

    A grid of B*H single-head programs spends ~2 us/program on grid overhead
    (measured: 0.65 ms/call at B=40, H=8 — ~15 TFLOP/s); batching heads into
    one program with a batched ``dot_general`` amortises it.
    """
    HB = q_ref.shape[1]
    kbias = kbias_ref[0]                      # (1, Tk_pad) key bias row
    # The kernel is VPU-bound on the softmax exp (measured ~0.5 ms/call at
    # B=40, H=8, T=299 — the two MXU matmuls are ~5% of that).  For bf16
    # inputs (the production path) the exp/normalise runs in bf16, packing
    # two lanes per VPU op; f32 inputs (torch-parity path) stay f32.
    soft_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    for h in range(HB):                       # static unroll: one program,
        q = q_ref[0, h]                        # HB head-sized matmuls
        k = k_ref[0, h]
        v = v_ref[0, h]

        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                              # (Tq, Tk) f32 accumulate
        logits = logits + kbias
        if qkbias_ref is not None:
            logits = logits + qkbias_ref[0]   # (Tq_pad, Tk_pad) shared mask

        row_max = jnp.max(logits, axis=-1, keepdims=True)
        if zero_attn:
            # The implicit zero token's logit is 0; it participates in the max.
            row_max = jnp.maximum(row_max, 0.0)
        p = jnp.exp((logits - row_max).astype(soft_dtype))
        denom = p.astype(jnp.float32).sum(axis=-1, keepdims=True)
        if zero_attn:
            denom = denom + jnp.exp(-row_max)  # exp(0 - row_max) * 1
        p = (p.astype(jnp.float32) / denom).astype(v.dtype)

        out = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, h] = out.astype(out_ref.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, kbias_ref, out_ref, *, scale, zero_attn):
    _attn_body(q_ref, k_ref, v_ref, kbias_ref, None, out_ref,
               scale=scale, zero_attn=zero_attn)


def _attn_kernel_qk(q_ref, k_ref, v_ref, kbias_ref, qkbias_ref, out_ref, *, scale, zero_attn):
    _attn_body(q_ref, k_ref, v_ref, kbias_ref, qkbias_ref, out_ref,
               scale=scale, zero_attn=zero_attn)


def fused_attention(
    q: jnp.ndarray,                 # (B, H, Tq, D)
    k: jnp.ndarray,                 # (B, H, Tk, D)
    v: jnp.ndarray,                 # (B, H, Tk, D)
    key_padding_mask=None,          # (B, Tk) bool, True = masked
    attn_mask=None,                 # (Tq, Tk) additive float mask
    zero_attn: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused attention: Pallas kernel forward, XLA-recompute
    backward (``custom_vjp`` — Pallas kernels have no autodiff rule)."""
    interpret = interpret or FORCE_INTERPRET
    if key_padding_mask is None and attn_mask is None:
        return _fa_nomask(q, k, v, zero_attn, interpret)
    if attn_mask is None:
        return _fa_kpm(q, k, v, key_padding_mask, zero_attn, interpret)
    if key_padding_mask is None:
        return _fa_am(q, k, v, attn_mask, zero_attn, interpret)
    return _fa_both(q, k, v, key_padding_mask, attn_mask, zero_attn, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fa_nomask(q, k, v, zero_attn, interpret):
    return _fused_attention_impl(q, k, v, None, None, zero_attn, interpret)


def _fa_nomask_fwd(q, k, v, zero_attn, interpret):
    return _fa_nomask(q, k, v, zero_attn, interpret), (q, k, v)


def _fa_nomask_bwd(zero_attn, interpret, res, g):
    q, k, v = res
    if USE_PALLAS_BWD:
        return _fused_attention_bwd_impl(q, k, v, None, None, g, zero_attn, interpret)
    _, vjp = jax.vjp(lambda a, b, c: reference_attention(a, b, c, zero_attn=zero_attn), q, k, v)
    return vjp(g)


_fa_nomask.defvjp(_fa_nomask_fwd, _fa_nomask_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fa_kpm(q, k, v, kpm, zero_attn, interpret):
    return _fused_attention_impl(q, k, v, kpm, None, zero_attn, interpret)


def _fa_kpm_fwd(q, k, v, kpm, zero_attn, interpret):
    return _fa_kpm(q, k, v, kpm, zero_attn, interpret), (q, k, v, kpm)


def _fa_kpm_bwd(zero_attn, interpret, res, g):
    q, k, v, kpm = res
    if USE_PALLAS_BWD:
        return _fused_attention_bwd_impl(q, k, v, kpm, None, g, zero_attn, interpret) + (None,)
    _, vjp = jax.vjp(
        lambda a, b, c: reference_attention(a, b, c, key_padding_mask=kpm, zero_attn=zero_attn),
        q, k, v,
    )
    return vjp(g) + (None,)


_fa_kpm.defvjp(_fa_kpm_fwd, _fa_kpm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fa_am(q, k, v, am, zero_attn, interpret):
    return _fused_attention_impl(q, k, v, None, am, zero_attn, interpret)


def _fa_am_fwd(q, k, v, am, zero_attn, interpret):
    return _fa_am(q, k, v, am, zero_attn, interpret), (q, k, v, am)


def _fa_am_bwd(zero_attn, interpret, res, g):
    q, k, v, am = res
    _, vjp = jax.vjp(
        lambda a, b, c: reference_attention(a, b, c, attn_mask=am, zero_attn=zero_attn),
        q, k, v,
    )
    return vjp(g) + (None,)


_fa_am.defvjp(_fa_am_fwd, _fa_am_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fa_both(q, k, v, kpm, am, zero_attn, interpret):
    return _fused_attention_impl(q, k, v, kpm, am, zero_attn, interpret)


def _fa_both_fwd(q, k, v, kpm, am, zero_attn, interpret):
    return _fa_both(q, k, v, kpm, am, zero_attn, interpret), (q, k, v, kpm, am)


def _fa_both_bwd(zero_attn, interpret, res, g):
    q, k, v, kpm, am = res
    _, vjp = jax.vjp(
        lambda a, b, c: reference_attention(
            a, b, c, key_padding_mask=kpm, attn_mask=am, zero_attn=zero_attn
        ),
        q, k, v,
    )
    return vjp(g) + (None, None)


_fa_both.defvjp(_fa_both_fwd, _fa_both_bwd)


def _fused_attention_impl(
    q, k, v, key_padding_mask, attn_mask, zero_attn: bool = True, interpret: bool = False
) -> jnp.ndarray:
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = 1.0 / (D**0.5)

    # Pad to TPU lane/sublane multiples; padded keys are masked off, padded
    # head dims are zeros (contribute nothing to q.k or the output slice).
    Tq_p = _round_up(max(Tq, 8), 8)
    Tk_p = _round_up(max(Tk, 128), 128)
    D_p = _round_up(max(D, 128), 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tq_p - Tq), (0, D_p - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Tk_p - Tk), (0, D_p - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Tk_p - Tk), (0, D_p - D)))

    # Per-batch key-bias row: -inf on padded and key-padding-masked keys.
    key_valid = jnp.arange(Tk_p) < Tk
    kbias = jnp.where(key_valid[None, :], 0.0, NEG_INF).astype(jnp.float32)
    kbias = jnp.broadcast_to(kbias, (B, Tk_p))
    if key_padding_mask is not None:
        kpm = jnp.pad(key_padding_mask, ((0, 0), (0, Tk_p - Tk)), constant_values=True)
        kbias = jnp.where(kpm, NEG_INF, kbias)
    kbias = kbias[:, None, :]  # (B, 1, Tk_p)

    # Heads per program: as many as fit a ~12 MiB VMEM budget (f32 working
    # set: q/k/v + logits + probs + out), among divisors of H.
    def _vmem_bytes(hb: int) -> int:
        return 4 * hb * (
            Tq_p * D_p + 2 * Tk_p * D_p + 2 * Tq_p * Tk_p + Tq_p * D_p
        )

    HB = 1
    for cand in range(H, 0, -1):
        if H % cand == 0 and _vmem_bytes(cand) <= 12 * 1024 * 1024:
            HB = cand
            break

    in_specs = [
        pl.BlockSpec((1, HB, Tq_p, D_p), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HB, Tk_p, D_p), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HB, Tk_p, D_p), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        # One key-bias row per batch, shared across that batch's programs.
        pl.BlockSpec((1, 1, Tk_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [qp, kp, vp, kbias]
    if attn_mask is not None:
        qkbias = jnp.pad(
            attn_mask.astype(jnp.float32),
            ((0, Tq_p - Tq), (0, Tk_p - Tk)),
            constant_values=0.0,
        )[None]
        in_specs.append(
            pl.BlockSpec((1, Tq_p, Tk_p), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(qkbias)
        kernel = functools.partial(_attn_kernel_qk, scale=scale, zero_attn=zero_attn)
    else:
        kernel = functools.partial(_attn_kernel, scale=scale, zero_attn=zero_attn)

    bh = B * H
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq_p, D_p), q.dtype),
        grid=(B, H // HB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, HB, Tq_p, D_p), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * Tq_p * Tk_p * D_p * 2,
            bytes_accessed=4 * bh * (Tq_p * D_p * 2 + Tk_p * D_p * 2),
            transcendentals=bh * Tq_p * Tk_p,
        ),
        interpret=interpret,
    )(*inputs)

    return out[:, :, :Tq, :D]


def reference_attention(q, k, v, key_padding_mask=None, attn_mask=None, zero_attn=True):
    """Pure-XLA reference implementation (same math, for tests/fallback)."""
    B, H, Tq, D = q.shape
    scale = 1.0 / (D**0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, logits)
    if attn_mask is not None:
        logits = logits + attn_mask[None, None]
    if zero_attn:
        zeros = jnp.zeros(logits.shape[:-1] + (1,), logits.dtype)
        logits = jnp.concatenate([logits, zeros], axis=-1)
        p = jax.nn.softmax(logits, axis=-1)[..., :-1]
    else:
        p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


# ---------------------------------------------------------------------------
# Hand-written Pallas backward kernel (training path)
# ---------------------------------------------------------------------------
#
# The custom_vjp backward above recomputes attention through XLA, which
# materialises (B,H,Tq,Tk) logits/probability tensors in HBM — on top of the
# layer-level remat recompute that round 1 measured at -15%.  This kernel
# recomputes the softmax flash-style in VMEM and emits dq/dk/dv directly.
# f32 throughout (gradients must match the XLA path to ~1e-3).

USE_PALLAS_BWD = True   # module switch; tests flip it to compare paths


def _attn_bwd_kernel(q_ref, k_ref, v_ref, kbias_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, *, scale, zero_attn):
    """Multi-head program: blocks carry HB heads — single-head programs were
    measured grid-overhead-bound at training sizes (B*H > 500 programs of
    <1 us MXU work each).  Matmuls run on the input dtype (bf16 on the
    production path) with f32 accumulate; the softmax recompute and the
    softmax-jacobian combine stay f32 (gradients match XLA to ~1e-3)."""
    HB = q_ref.shape[1]
    kbias = kbias_ref[0]                          # (1, Tk_p)
    for h in range(HB):
        q = q_ref[0, h]                           # (Tq_p, D_p) input dtype
        k = k_ref[0, h]
        v = v_ref[0, h]
        g = g_ref[0, h]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + kbias
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        if zero_attn:
            row_max = jnp.maximum(row_max, 0.0)
        p = jnp.exp(logits - row_max)
        denom = p.sum(axis=-1, keepdims=True)
        if zero_attn:
            denom = denom + jnp.exp(-row_max)
        p = p / denom                             # (Tq_p, Tk_p) f32

        # dv = p^T g ; dp = g v^T ; ds = p * (dp - rowsum(dp*p)) ; the
        # implicit zero-attn column has v=0 so dp_0=0 and drops out of the
        # rowsum.
        pc = p.astype(q.dtype)
        dv = jax.lax.dot_general(pc, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dsum = (dp * p).sum(axis=-1, keepdims=True)
        ds = (p * (dp - dsum)).astype(q.dtype)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale

        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _fused_attention_bwd_impl(q, k, v, key_padding_mask, attn_mask, g,
                              zero_attn: bool, interpret: bool):
    """(dq, dk, dv) via one Pallas program per (batch, head)."""
    if attn_mask is not None:
        # The causal-CLIP path trains rarely; keep the XLA fallback there.
        raise NotImplementedError
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = 1.0 / (D ** 0.5)
    Tq_p = _round_up(max(Tq, 8), 8)
    Tk_p = _round_up(max(Tk, 128), 128)
    D_p = _round_up(max(D, 128), 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tq_p - Tq), (0, D_p - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Tk_p - Tk), (0, D_p - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Tk_p - Tk), (0, D_p - D)))
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, Tq_p - Tq), (0, D_p - D)))

    key_valid = jnp.arange(Tk_p) < Tk
    kbias = jnp.where(key_valid[None, :], 0.0, NEG_INF).astype(jnp.float32)
    kbias = jnp.broadcast_to(kbias, (B, Tk_p))
    if key_padding_mask is not None:
        kpm = jnp.pad(key_padding_mask, ((0, 0), (0, Tk_p - Tk)), constant_values=True)
        kbias = jnp.where(kpm, NEG_INF, kbias)
    kbias = kbias[:, None, :]

    # Heads per program: VMEM working set is ~4 T x D blocks in/out per head
    # plus two (Tq, Tk) f32 logit/grad panels.
    def _vmem_bytes(hb: int) -> int:
        return 4 * hb * (3 * Tq_p * D_p + 4 * Tk_p * D_p + 3 * Tq_p * Tk_p)

    HB = 1
    for cand in range(H, 0, -1):
        if H % cand == 0 and _vmem_bytes(cand) <= 12 * 1024 * 1024:
            HB = cand
            break

    q_spec = pl.BlockSpec((1, HB, Tq_p, D_p), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, HB, Tk_p, D_p), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, zero_attn=zero_attn),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tq_p, D_p), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tk_p, D_p), k.dtype),
            jax.ShapeDtypeStruct((B, H, Tk_p, D_p), v.dtype),
        ),
        grid=(B, H // HB),
        in_specs=[
            q_spec, kv_spec, kv_spec,
            pl.BlockSpec((1, 1, Tk_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec,
        ],
        out_specs=(q_spec, kv_spec, kv_spec),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * H * Tq_p * Tk_p * D_p,
            bytes_accessed=4 * B * H * (2 * Tq_p + 3 * Tk_p) * D_p,
            transcendentals=B * H * Tq_p * Tk_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, kbias, gp)

    return (
        dq[:, :, :Tq, :D],
        dk[:, :, :Tk, :D],
        dv[:, :, :Tk, :D],
    )
