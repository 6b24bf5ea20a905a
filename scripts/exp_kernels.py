"""Kernel-variant experiments for the fused SA block (scratch, not shipped).

Candidate levers at the production shape (B=40, T=299, E=1024, H=8):
  v0   current fused_sa_block (baseline)
  v1   merged QKV: one (E, 3E) projection matmul instead of three (E, E)
  v2   v1 + R rows per program (bigger MXU M-dim on the projections)
  v3   v2 + reciprocal-multiply softmax (1/denom once, then multiply)

All variants are exact algebraic rewrites of the same math (the merged
projection computes the identical contraction per output column; multi-row
blocks just batch independent rows), so a winner can replace the default
path without parity risk.

Usage: python scripts/exp_kernels.py [--quant]   (idle machine, one chip)
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from mixermdm_tpu.ops.attention import NEG_INF, _round_up  # noqa: E402
from mixermdm_tpu.ops.fused_block import (  # noqa: E402
    KV_PAD, _ln, _quant_act, _qdot8, _qdot, quantize_weight, fused_sa_block,
)

BF16_PEAK = 197e12
INT8_PEAK = 394e12
INNER = 200


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / INNER


def chain(kernel_fn):
    @jax.jit
    def run(x, *rest):
        def body(h, _):
            h = kernel_fn(h, *rest)
            return h / (jnp.abs(h).max() + 1e-3), None

        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h

    return run


# --------------------------------------------------------------------------
# Variant kernel: merged QKV, R rows per program, optional recip softmax.
# --------------------------------------------------------------------------

def _sa_v_kernel(
    x_ref, scale_ref, shift_ref, kbias_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    out_ref,
    *, n_heads, attn_scale, zero_attn, eps, residual, rows, recip,
    wqkvs_ref=None, wos_ref=None,
):
    E = x_ref.shape[2]
    Tk = x_ref.shape[1]
    Tq = out_ref.shape[1]
    D = E // n_heads
    x = x_ref[...]                                   # (R, Tk, E)
    cd = x.dtype

    x2 = x.reshape(rows * Tk, E)
    xn = _ln(x2.astype(jnp.float32), eps).astype(cd).reshape(rows, Tk, E)
    xn = xn * (1.0 + scale_ref[:, 0][:, None]) + shift_ref[:, 0][:, None]
    xn2 = xn.reshape(rows * Tk, E)

    if wqkvs_ref is not None:
        x8, xs = _quant_act(xn2)
        qkv = _qdot8(x8, xs, wqkv_ref[...], wqkvs_ref[...]) + bqkv_ref[...]
    else:
        qkv = jax.lax.dot_general(
            xn2, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[...]
    qkv = qkv.astype(cd).reshape(rows, Tk, 3 * E)
    q = qkv[:, :Tq, :E]
    k = qkv[:, :, E:2 * E]
    v = qkv[:, :, 2 * E:]

    soft_dtype = jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32
    outs = []
    for r in range(rows):
        kbias = kbias_ref[r]                          # (1, Tk)
        heads = []
        for h in range(n_heads):
            qh = q[r, :, h * D:(h + 1) * D]
            kh = k[r, :, h * D:(h + 1) * D]
            vh = v[r, :, h * D:(h + 1) * D]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * attn_scale + kbias
            row_max = jnp.max(logits, axis=-1, keepdims=True)
            if zero_attn:
                row_max = jnp.maximum(row_max, 0.0)
            p = jnp.exp((logits - row_max).astype(soft_dtype))
            denom = p.astype(jnp.float32).sum(axis=-1, keepdims=True)
            if zero_attn:
                denom = denom + jnp.exp(-row_max)
            if recip:
                p = (p.astype(jnp.float32) * (1.0 / denom)).astype(cd)
            else:
                p = (p.astype(jnp.float32) / denom).astype(cd)
            heads.append(jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        outs.append(jnp.concatenate(heads, axis=-1))
    attn_out = jnp.stack(outs).reshape(rows * Tq, E)

    if wqkvs_ref is not None:
        y = _qdot(attn_out, wo_ref[...], wos_ref[...]) + bo_ref[...]
    else:
        y = jax.lax.dot_general(
            attn_out.astype(cd), wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[...]
    y = y.astype(out_ref.dtype).reshape(rows, Tq, E)
    if residual:
        y = y + x[:, :Tq]
    out_ref[...] = y


def _sa_v_kernel_q8(x_ref, scale_ref, shift_ref, kbias_ref,
                    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                    wqkvs_ref, wos_ref, out_ref, **kw):
    _sa_v_kernel(x_ref, scale_ref, shift_ref, kbias_ref,
                 wqkv_ref, bqkv_ref, wo_ref, bo_ref, out_ref,
                 wqkvs_ref=wqkvs_ref, wos_ref=wos_ref, **kw)


def sa_variant(x, scale, shift, wq, bq, wk, bk, wv, bv, wo, bo,
               key_padding_mask=None, *, n_heads, rows=1, recip=False,
               zero_attn=True, eps=1e-6, residual=True, quant=False):
    B, T, E = x.shape
    assert B % rows == 0
    D = E // n_heads
    attn_scale = 1.0 / (D ** 0.5)
    Tq_p = _round_up(max(T, 8), 8)
    Tk_p = _round_up(max(T, KV_PAD), KV_PAD)
    xp = jnp.pad(x, ((0, 0), (0, Tk_p - T), (0, 0)))

    key_valid = jnp.arange(Tk_p) < T
    kbias = jnp.where(key_valid[None, :], 0.0, NEG_INF).astype(jnp.float32)
    kbias = jnp.broadcast_to(kbias, (B, Tk_p))
    if key_padding_mask is not None:
        kpm = jnp.pad(key_padding_mask, ((0, 0), (0, Tk_p - T)),
                      constant_values=True)
        kbias = jnp.where(kpm, NEG_INF, kbias)
    kbias = kbias[:, None, :]

    cd = x.dtype
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    bqkv = jnp.concatenate([bq, bk, bv]).astype(jnp.float32).reshape(1, 3 * E)

    G = B // rows
    bs = pl.BlockSpec((rows, Tk_p, E), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((rows, 1, E), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    kb = pl.BlockSpec((rows, 1, Tk_p), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    cqkv = pl.BlockSpec((E, 3 * E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cbq = pl.BlockSpec((1, 3 * E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    co = pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cbo = pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM)

    in_specs = [bs, vs, vs, kb, cqkv, cbq, co, cbo]
    if quant:
        wqkv8, wqkvs = quantize_weight(wqkv)
        wo8, wos = quantize_weight(wo)
        inputs = [xp, scale.astype(cd)[:, None], shift.astype(cd)[:, None],
                  kbias, wqkv8, bqkv, wo8,
                  bo.astype(jnp.float32).reshape(1, E), wqkvs, wos]
        in_specs = in_specs + [cbq, cbo]
        kernel = _sa_v_kernel_q8
    else:
        inputs = [xp, scale.astype(cd)[:, None], shift.astype(cd)[:, None],
                  kbias, wqkv.astype(cd), bqkv, wo.astype(cd),
                  bo.astype(jnp.float32).reshape(1, E)]
        kernel = _sa_v_kernel

    out = pl.pallas_call(
        functools.partial(kernel, n_heads=n_heads, attn_scale=attn_scale,
                          zero_attn=zero_attn, eps=eps, residual=residual,
                          rows=rows, recip=recip),
        out_shape=jax.ShapeDtypeStruct((B, Tq_p, E), x.dtype),
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, Tq_p, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tk_p * E * (4 * E + 2 * Tq_p),
            bytes_accessed=2 * B * Tk_p * E * 2 + 4 * E * E * 2,
            transcendentals=B * n_heads * Tq_p * Tk_p,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*inputs)
    return out[:, :T]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="assert variants match the shipped kernel")
    ap.add_argument("--ablate", action="store_true",
                    help="time the kernel with pieces disabled")
    ap.add_argument("--headbatch", action="store_true",
                    help="batched-dot attention vs the per-head loop")
    ap.add_argument("--int8attn", action="store_true",
                    help="static activation scales + int8 attention matmuls")
    args = ap.parse_args()

    if args.ablate:
        ablate_main(args.quant)
        return
    if args.headbatch:
        headbatch_main(args.quant, args.check)
        return
    if args.int8attn:
        int8attn_main()
        return

    from mixermdm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    B, T, E, H = 40, 299, 1024, 8
    x = jnp.asarray(rng.standard_normal((B, T, E)) * 0.05, jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal((B, E)) * 0.05, jnp.bfloat16)
    sh = jnp.asarray(rng.standard_normal((B, E)) * 0.05, jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((E, E)) * 0.02, jnp.float32)
          for _ in range(4)]
    bs = [jnp.asarray(rng.standard_normal(E) * 0.02, jnp.float32)
          for _ in range(4)]
    kpm = jnp.zeros((B, T), bool)
    wb = sum(zip(ws, bs), ())
    q = args.quant

    if args.check:
        ref = fused_sa_block(x, sc, sh, *wb, kpm, n_heads=H, residual=True,
                             quant=q)
        for rows, recip in ((1, False), (2, False), (4, False), (2, True)):
            out = sa_variant(x, sc, sh, *wb, kpm, n_heads=H, rows=rows,
                             recip=recip, quant=q)
            d = float(jnp.abs(out.astype(jnp.float32)
                              - ref.astype(jnp.float32)).max())
            print(f"rows={rows} recip={recip}: max|diff| = {d:.3e}")
        return

    Tp = _round_up(T, 8)
    proj = 8 * B * Tp * E * E
    attn = 4 * B * Tp * Tp * E
    flops = proj + attn
    sol = (proj / (INT8_PEAK if q else BF16_PEAK) + attn / BF16_PEAK)

    base = timeit(chain(lambda h: h), x)
    print(f"--- SA variants ({'w8a8' if q else 'bf16'}; B={B} T={T} E={E}) ---")
    print(f"overhead {base * 1e3:7.3f} ms/iter (subtracted)")

    v0 = chain(lambda h, sc, sh: fused_sa_block(
        h, sc, sh, *wb, kpm, n_heads=H, residual=True, quant=q))
    runs = [("v0 current", v0)]
    for rows, recip, name in (
        (1, False, "v1 mergedQKV"),
        (2, False, "v2 rows=2"),
        (4, False, "v2 rows=4"),
        (2, True, "v3 rows=2+recip"),
        (4, True, "v3 rows=4+recip"),
    ):
        runs.append((name, chain(functools.partial(
            lambda h, sc, sh, rows, recip: sa_variant(
                h, sc, sh, *wb, kpm, n_heads=H, rows=rows, recip=recip,
                quant=q),
            rows=rows, recip=recip))))

    for name, fn in runs:
        dt = max(timeit(fn, x, sc, sh) - base, 1e-9)
        print(f"{name:16s} {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s"
              f"  ({100 * sol / dt:4.1f}% of SoL)")




# --------------------------------------------------------------------------
# Ablation: the shipped kernel structure with pieces disabled, to decompose
# per-program time into LN / quant / projections / attention+softmax.
# Ablated variants compute DIFFERENT math — timing only.
# --------------------------------------------------------------------------

def _sa_abl_kernel(
    x_ref, scale_ref, shift_ref, kbias_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    out_ref,
    *, n_heads, attn_scale, zero_attn, eps,
    skip_ln=False, skip_attn=False, skip_softmax=False, quant=False,
    wqs_ref=None, wks_ref=None, wvs_ref=None, wos_ref=None,
):
    E = x_ref.shape[2]
    Tq = out_ref.shape[1]
    D = E // n_heads
    x = x_ref[0]
    cd = x.dtype

    if skip_ln:
        xn = x
    else:
        xn = _ln(x.astype(jnp.float32), eps).astype(cd)
        xn = xn * (1.0 + scale_ref[0, 0]) + shift_ref[0, 0]

    if quant:
        x8, xs = _quant_act(xn)
        q = _qdot8(x8[:Tq], xs[:Tq], wq_ref[...], wqs_ref[...]) + bq_ref[...]
        k = _qdot8(x8, xs, wk_ref[...], wks_ref[...]) + bk_ref[...]
        v = _qdot8(x8, xs, wv_ref[...], wvs_ref[...]) + bv_ref[...]
    else:
        dot = lambda a, w: jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        q = dot(xn[:Tq], wq_ref[...]) + bq_ref[...]
        k = dot(xn, wk_ref[...]) + bk_ref[...]
        v = dot(xn, wv_ref[...]) + bv_ref[...]
    q, k, v = q.astype(cd), k.astype(cd), v.astype(cd)

    if skip_attn:
        attn_out = v[:Tq]
    else:
        kbias = kbias_ref[0]
        soft_dtype = jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32
        heads = []
        for h in range(n_heads):
            qh = q[:, h * D:(h + 1) * D]
            kh = k[:, h * D:(h + 1) * D]
            vh = v[:, h * D:(h + 1) * D]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * attn_scale + kbias
            if skip_softmax:
                p = logits.astype(cd)
            else:
                row_max = jnp.max(logits, axis=-1, keepdims=True)
                if zero_attn:
                    row_max = jnp.maximum(row_max, 0.0)
                p = jnp.exp((logits - row_max).astype(soft_dtype))
                denom = p.astype(jnp.float32).sum(axis=-1, keepdims=True)
                if zero_attn:
                    denom = denom + jnp.exp(-row_max)
                p = (p.astype(jnp.float32) / denom).astype(cd)
            heads.append(jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        attn_out = jnp.concatenate(heads, axis=-1)

    if quant:
        y = _qdot(attn_out.astype(cd), wo_ref[...], wos_ref[...]) + bo_ref[...]
    else:
        y = jax.lax.dot_general(
            attn_out.astype(cd), wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bo_ref[...]
    out_ref[0] = (y.astype(out_ref.dtype) + x[:Tq])


def _abl_q8(x_ref, scale_ref, shift_ref, kbias_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
            wqs_ref, wks_ref, wvs_ref, wos_ref, out_ref, **kw):
    _sa_abl_kernel(x_ref, scale_ref, shift_ref, kbias_ref,
                   wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                   wo_ref, bo_ref, out_ref,
                   wqs_ref=wqs_ref, wks_ref=wks_ref, wvs_ref=wvs_ref,
                   wos_ref=wos_ref, quant=True, **kw)


def sa_ablate(x, scale, shift, wq, bq, wk, bk, wv, bv, wo, bo,
              *, n_heads, quant=False, **skips):
    B, T, E = x.shape
    D = E // n_heads
    attn_scale = 1.0 / (D ** 0.5)
    Tq_p = _round_up(max(T, 8), 8)
    Tk_p = _round_up(max(T, KV_PAD), KV_PAD)
    xp = jnp.pad(x, ((0, 0), (0, Tk_p - T), (0, 0)))
    key_valid = jnp.arange(Tk_p) < T
    kbias = jnp.where(key_valid[None, :], 0.0, NEG_INF).astype(jnp.float32)
    kbias = jnp.broadcast_to(kbias, (B, Tk_p))[:, None, :]
    cd = x.dtype
    row = lambda a: a.astype(jnp.float32).reshape(1, E)

    bs = pl.BlockSpec((1, Tk_p, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((1, 1, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c2 = pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    c1 = pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [bs, vs, vs,
                pl.BlockSpec((1, 1, Tk_p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                c2, c1, c2, c1, c2, c1, c2, c1]
    if quant:
        (wq8, wqs), (wk8, wks) = quantize_weight(wq), quantize_weight(wk)
        (wv8, wvs), (wo8, wos) = quantize_weight(wv), quantize_weight(wo)
        inputs = [xp, scale.astype(cd)[:, None], shift.astype(cd)[:, None],
                  kbias, wq8, row(bq), wk8, row(bk), wv8, row(bv), wo8,
                  row(bo), wqs, wks, wvs, wos]
        in_specs = in_specs + [c1] * 4
        kernel = _abl_q8
    else:
        w = lambda a: a.astype(cd)
        inputs = [xp, scale.astype(cd)[:, None], shift.astype(cd)[:, None],
                  kbias, w(wq), row(bq), w(wk), row(bk), w(wv), row(bv),
                  w(wo), row(bo)]
        kernel = _sa_abl_kernel

    return pl.pallas_call(
        functools.partial(kernel, n_heads=n_heads, attn_scale=attn_scale,
                          zero_attn=True, eps=1e-6, **skips),
        out_shape=jax.ShapeDtypeStruct((B, Tq_p, E), x.dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Tq_p, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(*inputs)[:, :T]


def ablate_main(quant):
    from mixermdm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, T, E, H = 40, 299, 1024, 8
    x = jnp.asarray(rng.standard_normal((B, T, E)) * 0.05, jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal((B, E)) * 0.05, jnp.bfloat16)
    sh = jnp.asarray(rng.standard_normal((B, E)) * 0.05, jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((E, E)) * 0.02, jnp.float32)
          for _ in range(4)]
    bs = [jnp.asarray(rng.standard_normal(E) * 0.02, jnp.float32)
          for _ in range(4)]
    wb = sum(zip(ws, bs), ())

    base = timeit(chain(lambda h: h), x)
    print(f"--- SA ablation ({'w8a8' if quant else 'bf16'}) ---")
    for name, skips in (
        ("full", {}),
        ("no-softmax", dict(skip_softmax=True)),
        ("no-attn", dict(skip_attn=True)),
        ("no-ln", dict(skip_ln=True)),
        ("no-attn,no-ln", dict(skip_attn=True, skip_ln=True)),
    ):
        fn = chain(functools.partial(
            lambda h, sc, sh, skips: sa_ablate(
                h, sc, sh, *wb, n_heads=H, quant=quant, **skips),
            skips=skips))
        dt = max(timeit(fn, x, sc, sh) - base, 1e-9)
        print(f"{name:16s} {dt * 1e3:7.3f} ms")




# --------------------------------------------------------------------------
# Attention-formulation variants: the per-head loop's 16 small matmuls run
# at ~32% MXU efficiency (ablation above).  Try batched dot_general over a
# head axis instead of the unrolled loop.
# --------------------------------------------------------------------------

def _sa_hb_kernel(
    x_ref, scale_ref, shift_ref, kbias_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    out_ref,
    *, n_heads, attn_scale, zero_attn, eps, quant=False,
    wqs_ref=None, wks_ref=None, wvs_ref=None, wos_ref=None,
):
    E = x_ref.shape[2]
    Tk = x_ref.shape[1]
    Tq = out_ref.shape[1]
    D = E // n_heads
    x = x_ref[0]
    cd = x.dtype

    xn = _ln(x.astype(jnp.float32), eps).astype(cd)
    xn = xn * (1.0 + scale_ref[0, 0]) + shift_ref[0, 0]

    if quant:
        x8, xs = _quant_act(xn)
        q = _qdot8(x8[:Tq], xs[:Tq], wq_ref[...], wqs_ref[...]) + bq_ref[...]
        k = _qdot8(x8, xs, wk_ref[...], wks_ref[...]) + bk_ref[...]
        v = _qdot8(x8, xs, wv_ref[...], wvs_ref[...]) + bv_ref[...]
    else:
        dot = lambda a, w: jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        q = dot(xn[:Tq], wq_ref[...]) + bq_ref[...]
        k = dot(xn, wk_ref[...]) + bk_ref[...]
        v = dot(xn, wv_ref[...]) + bv_ref[...]
    q, k, v = q.astype(cd), k.astype(cd), v.astype(cd)

    # (T, H*D) -> (H, T, D)
    qh = q.reshape(Tq, n_heads, D).transpose(1, 0, 2)
    kh = k.reshape(Tk, n_heads, D).transpose(1, 0, 2)
    vh = v.reshape(Tk, n_heads, D).transpose(1, 0, 2)

    logits = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * attn_scale                                    # (H, Tq, Tk)
    logits = logits + kbias_ref[0]                    # (1, Tk) broadcast
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    if zero_attn:
        row_max = jnp.maximum(row_max, 0.0)
    soft_dtype = jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32
    p = jnp.exp((logits - row_max).astype(soft_dtype))
    denom = p.astype(jnp.float32).sum(axis=-1, keepdims=True)
    if zero_attn:
        denom = denom + jnp.exp(-row_max)
    p = (p.astype(jnp.float32) / denom).astype(cd)

    ao = jax.lax.dot_general(
        p, vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                 # (H, Tq, D)
    attn_out = ao.transpose(1, 0, 2).reshape(Tq, E)

    if quant:
        y = _qdot(attn_out.astype(cd), wo_ref[...], wos_ref[...]) + bo_ref[...]
    else:
        y = jax.lax.dot_general(
            attn_out.astype(cd), wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bo_ref[...]
    out_ref[0] = (y.astype(out_ref.dtype) + x[:Tq])


def _hb_q8(x_ref, scale_ref, shift_ref, kbias_ref,
           wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
           wqs_ref, wks_ref, wvs_ref, wos_ref, out_ref, **kw):
    _sa_hb_kernel(x_ref, scale_ref, shift_ref, kbias_ref,
                  wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  wo_ref, bo_ref, out_ref,
                  wqs_ref=wqs_ref, wks_ref=wks_ref, wvs_ref=wvs_ref,
                  wos_ref=wos_ref, quant=True, **kw)


def sa_headbatch(x, scale, shift, wq, bq, wk, bk, wv, bv, wo, bo,
                 *, n_heads, quant=False):
    B, T, E = x.shape
    D = E // n_heads
    attn_scale = 1.0 / (D ** 0.5)
    Tq_p = _round_up(max(T, 8), 8)
    Tk_p = _round_up(max(T, KV_PAD), KV_PAD)
    xp = jnp.pad(x, ((0, 0), (0, Tk_p - T), (0, 0)))
    key_valid = jnp.arange(Tk_p) < T
    kbias = jnp.where(key_valid[None, :], 0.0, NEG_INF).astype(jnp.float32)
    kbias = jnp.broadcast_to(kbias, (B, Tk_p))[:, None, :]
    cd = x.dtype
    row = lambda a: a.astype(jnp.float32).reshape(1, E)

    bs = pl.BlockSpec((1, Tk_p, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((1, 1, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c2 = pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    c1 = pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [bs, vs, vs,
                pl.BlockSpec((1, 1, Tk_p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                c2, c1, c2, c1, c2, c1, c2, c1]
    if quant:
        (wq8, wqs), (wk8, wks) = quantize_weight(wq), quantize_weight(wk)
        (wv8, wvs), (wo8, wos) = quantize_weight(wv), quantize_weight(wo)
        inputs = [xp, scale.astype(cd)[:, None], shift.astype(cd)[:, None],
                  kbias, wq8, row(bq), wk8, row(bk), wv8, row(bv), wo8,
                  row(bo), wqs, wks, wvs, wos]
        in_specs = in_specs + [c1] * 4
        kernel = _hb_q8
    else:
        w = lambda a: a.astype(cd)
        inputs = [xp, scale.astype(cd)[:, None], shift.astype(cd)[:, None],
                  kbias, w(wq), row(bq), w(wk), row(bk), w(wv), row(bv),
                  w(wo), row(bo)]
        kernel = _sa_hb_kernel

    return pl.pallas_call(
        functools.partial(kernel, n_heads=n_heads, attn_scale=attn_scale,
                          zero_attn=True, eps=1e-6),
        out_shape=jax.ShapeDtypeStruct((B, Tq_p, E), x.dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Tq_p, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*inputs)[:, :T]


def headbatch_main(quant, check):
    from mixermdm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, T, E, H = 40, 299, 1024, 8
    x = jnp.asarray(rng.standard_normal((B, T, E)) * 0.05, jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal((B, E)) * 0.05, jnp.bfloat16)
    sh = jnp.asarray(rng.standard_normal((B, E)) * 0.05, jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((E, E)) * 0.02, jnp.float32)
          for _ in range(4)]
    bs = [jnp.asarray(rng.standard_normal(E) * 0.02, jnp.float32)
          for _ in range(4)]
    wb = sum(zip(ws, bs), ())
    kpm = jnp.zeros((B, T), bool)

    if check:
        ref = fused_sa_block(x, sc, sh, *wb, kpm, n_heads=H, residual=True,
                             quant=quant)
        out = sa_headbatch(x, sc, sh, *wb, n_heads=H, quant=quant)
        d = float(jnp.abs(out.astype(jnp.float32)
                          - ref.astype(jnp.float32)).max())
        print(f"headbatch vs shipped: max|diff| = {d:.3e}")
        return

    base = timeit(chain(lambda h: h), x)
    v0 = chain(lambda h, sc, sh: fused_sa_block(
        h, sc, sh, *wb, kpm, n_heads=H, residual=True, quant=quant))
    hb = chain(lambda h, sc, sh: sa_headbatch(
        h, sc, sh, *wb, n_heads=H, quant=quant))
    print(f"--- head-batched attention ({'w8a8' if quant else 'bf16'}) ---")
    for name, fn in (("v0 head-loop", v0), ("head-batched", hb)):
        dt = max(timeit(fn, x, sc, sh) - base, 1e-9)
        print(f"{name:14s} {dt * 1e3:7.3f} ms")


# --------------------------------------------------------------------------
# VERDICT r4 int8 levers: (a) STATIC calibrated activation scale for the
# projections (the frozen denoisers see a known input distribution — one
# scalar scale per kernel per checkpoint replaces the per-row max reduce);
# (b) int8 ATTENTION matmuls — p@v with a static p-scale (softmax output is
# in [0,1] so 1/127 is exact up to rounding) + per-tensor v-scale, and
# optionally q@k with per-tensor q/k scales.  These change numerics
# (calibration clipping / attention rounding), so the harness reports the
# deviation vs the shipped w8a8 kernel alongside the timing.
# --------------------------------------------------------------------------

def _sa_i8x_kernel(
    x_ref, scale_ref, shift_ref, kbias_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    wqs_ref, wks_ref, wvs_ref, wos_ref,
    out_ref,
    *, n_heads, attn_scale, zero_attn, eps, residual,
    static_as, qpv, qqk,
):
    E = x_ref.shape[2]
    Tq = out_ref.shape[1]
    D = E // n_heads
    x = x_ref[0]
    cd = x.dtype

    xn = _ln(x.astype(jnp.float32), eps).astype(cd)
    xn = xn * (1.0 + scale_ref[0, 0]) + shift_ref[0, 0]

    if static_as is not None:
        inv = 1.0 / static_as
        x8 = jnp.clip(jnp.round(xn.astype(jnp.float32) * inv),
                      -127.0, 127.0).astype(jnp.int8)

        def dq(x8r, w8, ws):
            acc = jax.lax.dot_general(
                x8r, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (ws * static_as)

        q = dq(x8[:Tq], wq_ref[...], wqs_ref[...]) + bq_ref[...]
        k = dq(x8, wk_ref[...], wks_ref[...]) + bk_ref[...]
        v = dq(x8, wv_ref[...], wvs_ref[...]) + bv_ref[...]
    else:
        x8, xs = _quant_act(xn)
        q = _qdot8(x8[:Tq], xs[:Tq], wq_ref[...], wqs_ref[...]) + bq_ref[...]
        k = _qdot8(x8, xs, wk_ref[...], wks_ref[...]) + bk_ref[...]
        v = _qdot8(x8, xs, wv_ref[...], wvs_ref[...]) + bv_ref[...]

    kbias = kbias_ref[0]
    soft_dtype = jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32

    if qqk:
        qs = jnp.maximum(jnp.max(jnp.abs(q)), 1e-8) / 127.0
        ks = jnp.maximum(jnp.max(jnp.abs(k)), 1e-8) / 127.0
        q8 = jnp.clip(jnp.round(q / qs), -127.0, 127.0).astype(jnp.int8)
        k8 = jnp.clip(jnp.round(k / ks), -127.0, 127.0).astype(jnp.int8)
    else:
        qb, kb_ = q.astype(cd), k.astype(cd)
    if qpv:
        vs = jnp.maximum(jnp.max(jnp.abs(v)), 1e-8) / 127.0
        v8 = jnp.clip(jnp.round(v / vs), -127.0, 127.0).astype(jnp.int8)
    else:
        vb = v.astype(cd)

    heads = []
    for h in range(n_heads):
        if qqk:
            logits = jax.lax.dot_general(
                q8[:, h * D:(h + 1) * D], k8[:, h * D:(h + 1) * D],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (qs * ks * attn_scale)
        else:
            logits = jax.lax.dot_general(
                qb[:, h * D:(h + 1) * D], kb_[:, h * D:(h + 1) * D],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            ) * attn_scale
        logits = logits + kbias
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        if zero_attn:
            row_max = jnp.maximum(row_max, 0.0)
        p = jnp.exp((logits - row_max).astype(soft_dtype))
        denom = p.astype(jnp.float32).sum(axis=-1, keepdims=True)
        if zero_attn:
            denom = denom + jnp.exp(-row_max)
        p32 = p.astype(jnp.float32) / denom
        if qpv:
            p8 = jnp.round(p32 * 127.0).astype(jnp.int8)  # p in [0,1]
            heads.append(jax.lax.dot_general(
                p8, v8[:, h * D:(h + 1) * D], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (vs / 127.0))
        else:
            heads.append(jax.lax.dot_general(
                p32.astype(cd), vb[:, h * D:(h + 1) * D],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
    attn_out = jnp.concatenate(heads, axis=-1)

    y = _qdot(attn_out, wo_ref[...], wos_ref[...]) + bo_ref[...]
    y = y.astype(out_ref.dtype)
    if residual:
        y = y + x[:Tq]
    out_ref[0] = y


def sa_int8x(x, scale, shift, wq, bq, wk, bk, wv, bv, wo, bo,
             key_padding_mask=None, *, n_heads, static_as=None,
             qpv=False, qqk=False, zero_attn=True, eps=1e-6, residual=True):
    B, T, E = x.shape
    D = E // n_heads
    attn_scale = 1.0 / (D ** 0.5)
    Tq_p = _round_up(max(T, 8), 8)
    Tk_p = _round_up(max(T, KV_PAD), KV_PAD)
    xp = jnp.pad(x, ((0, 0), (0, Tk_p - T), (0, 0)))

    key_valid = jnp.arange(Tk_p) < T
    kbias = jnp.where(key_valid[None, :], 0.0, NEG_INF).astype(jnp.float32)
    kbias = jnp.broadcast_to(kbias, (B, Tk_p))
    if key_padding_mask is not None:
        kpm = jnp.pad(key_padding_mask, ((0, 0), (0, Tk_p - T)),
                      constant_values=True)
        kbias = jnp.where(kpm, NEG_INF, kbias)
    kbias = kbias[:, None, :]

    cd = x.dtype
    row = lambda a: a.astype(jnp.float32).reshape(1, E)
    (wq8, wqs), (wk8, wks) = quantize_weight(wq), quantize_weight(wk)
    (wv8, wvs), (wo8, wos) = quantize_weight(wv), quantize_weight(wo)

    batch_spec = pl.BlockSpec((1, Tk_p, E), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 1, E), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    const2 = pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    const1 = pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        batch_spec, vec_spec, vec_spec,
        pl.BlockSpec((1, 1, Tk_p), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const2, const1, const2, const1, const2, const1, const2, const1,
        const1, const1, const1, const1,
    ]
    inputs = [
        xp, scale.astype(cd)[:, None], shift.astype(cd)[:, None], kbias,
        wq8, row(bq), wk8, row(bk), wv8, row(bv), wo8, row(bo),
        wqs, wks, wvs, wos,
    ]
    out = pl.pallas_call(
        functools.partial(
            _sa_i8x_kernel, n_heads=n_heads, attn_scale=attn_scale,
            zero_attn=zero_attn, eps=eps, residual=residual,
            static_as=static_as, qpv=qpv, qqk=qqk,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tq_p, E), x.dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Tq_p, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tk_p * E * (4 * E + 2 * Tq_p),
            bytes_accessed=2 * B * Tk_p * E * 2 + 4 * E * E * 2,
            transcendentals=B * n_heads * Tq_p * Tk_p,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*inputs)
    return out[:, :T]


def int8attn_main():
    from mixermdm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, T, E, H = 40, 299, 1024, 8
    x = jnp.asarray(rng.standard_normal((B, T, E)) * 0.05, jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal((B, E)) * 0.05, jnp.bfloat16)
    sh = jnp.asarray(rng.standard_normal((B, E)) * 0.05, jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((E, E)) * 0.02, jnp.float32)
          for _ in range(4)]
    bs = [jnp.asarray(rng.standard_normal(E) * 0.02, jnp.float32)
          for _ in range(4)]
    wb = sum(zip(ws, bs), ())
    kpm = jnp.zeros((B, T), bool)

    # Self-calibrated static activation scale (the technique's best case:
    # the calibration batch IS the measured batch).
    xn = _ln(x.astype(jnp.float32), 1e-6)
    xn = xn * (1.0 + sc.astype(jnp.float32)[:, None]) \
        + sh.astype(jnp.float32)[:, None]
    static_as = float(jnp.max(jnp.abs(xn))) / 127.0

    ref_bf16 = fused_sa_block(x, sc, sh, *wb, kpm, n_heads=H,
                              residual=True, quant=False)
    ref_q8 = fused_sa_block(x, sc, sh, *wb, kpm, n_heads=H,
                            residual=True, quant=True)

    def rel(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-12))

    Tp = _round_up(T, 8)
    proj = 8 * B * Tp * E * E
    attn = 4 * B * Tp * Tp * E

    # RAW per-iteration times (no null-chain subtraction): the null chain's
    # normalisation sometimes fails to fuse and measures ~0.15 ms/iter that
    # does NOT exist inside the variant chains, which understated every
    # variant by that amount in the first run of this experiment.  Deltas
    # between rows are the signal either way.
    print(f"--- int8 levers (B={B} T={T} E={E}; dev = rel-L2 vs bf16; "
          f"shipped w8a8 dev = {rel(ref_q8, ref_bf16):.4f}) ---")

    variants = [
        ("shipped w8a8", dict(), True),
        ("static act scale", dict(static_as=static_as), False),
        ("int8 p@v", dict(qpv=True), False),
        ("int8 q@k + p@v", dict(qpv=True, qqk=True), False),
        ("static + int8 attn", dict(static_as=static_as, qpv=True, qqk=True),
         False),
    ]
    for name, kw, shipped in variants:
        if shipped:
            fn = chain(lambda h, sc, sh: fused_sa_block(
                h, sc, sh, *wb, kpm, n_heads=H, residual=True, quant=True))
            out = ref_q8
        else:
            fn = chain(functools.partial(
                lambda h, sc, sh, kw: sa_int8x(
                    h, sc, sh, *wb, kpm, n_heads=H, **kw), kw=kw))
            out = sa_int8x(x, sc, sh, *wb, kpm, n_heads=H, **kw)
        # int8 SoL: projections at INT8_PEAK; attention at INT8_PEAK only
        # for the quantised matmuls, else BF16_PEAK.
        a_peak_qk = INT8_PEAK if kw.get("qqk") else BF16_PEAK
        a_peak_pv = INT8_PEAK if kw.get("qpv") else BF16_PEAK
        sol = (proj / INT8_PEAK + attn / 2 / a_peak_qk + attn / 2 / a_peak_pv)
        dt = timeit(fn, x, sc, sh)
        print(f"{name:20s} {dt * 1e3:7.3f} ms  ({100 * sol / dt:4.1f}% of "
              f"int8 SoL)  dev={rel(out, ref_bf16):.4f}")


if __name__ == "__main__":
    main()
