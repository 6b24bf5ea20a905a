"""Micro-benchmarks for MXU dtype throughput and padding choices on TPU.

Methodology: host-side timing of individual sub-ms device calls through the
axon RPC tunnel is meaningless (async dispatch + ~25 ms floor), so every
measurement chains N dependent iterations inside ONE jitted
``lax.fori_loop`` — a single dispatch whose runtime is dominated by the op
under test.

Answers two design questions for the sampling hot path:
1. Is int8xint8->int32 actually ~2x bf16 on this chip (decides whether the
   W8A8 path for the frozen denoisers is worth enabling)?
2. Does an 8-multiple key/value padding (304 rows for T=299) beat the
   current 128-multiple (384) in the fused-block projection shapes?

Usage: python scripts/microbench_mxu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_ITERS = 50


def timeit_loop(step, x0, flops_per_iter, label, extra=""):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, N_ITERS, lambda i, x: step(x), x)

    out = run(x0)
    jax.block_until_ready(out)          # compile + warm
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{label}: {dt*1e3:.3f} ms/iter = "
          f"{flops_per_iter/dt/1e12:.1f} T(FL)OP/s {extra}")
    return dt


def main():
    rng = np.random.default_rng(0)

    # --- 1. dtype throughput on a denoiser-sized matmul ---------------------
    # (B*T, E) @ (E, E) chained: x <- f(x @ w), the SA projection workload.
    R, E = 40 * 384, 1024
    flops = 2 * R * E * E

    w_bf16 = jnp.asarray(rng.standard_normal((E, E)) * 0.03, jnp.bfloat16)
    x_bf16 = jnp.asarray(rng.standard_normal((R, E)), jnp.bfloat16)

    # w scaled by 0.03 keeps the chained activations O(1): std ~ sqrt(E)*0.03.
    def step_bf16(x):
        y = jnp.dot(x, w_bf16, preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    t_bf16 = timeit_loop(step_bf16, x_bf16, flops, "bf16 matmul")

    w8 = (np.clip(rng.standard_normal((E, E)), -1, 1) * 127).astype(np.int8)
    w8 = jnp.asarray(w8)
    x8 = jnp.asarray((rng.standard_normal((R, E)) * 20), jnp.int8)

    def step_int8(x):
        acc = jnp.dot(x, w8, preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)

    t_int8 = timeit_loop(step_int8, x8, flops, "int8 matmul",
                         extra=f"(speedup {t_bf16 and t_bf16/0.000001:.0f}" "")

    print(f"  -> int8 vs bf16 speedup: {t_bf16 / t_int8:.2f}x")

    # W8A8 with in-loop activation quant + dequant (the real kernel shape).
    ws = jnp.asarray(np.abs(rng.standard_normal(E)) * 0.01 + 0.001, jnp.float32)

    def step_w8a8(x):
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        acc = jnp.dot(q, w8, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * s * ws
        return y.astype(jnp.bfloat16)

    t_w8a8 = timeit_loop(step_w8a8, x_bf16, flops, "w8a8 (quant+matmul+dequant)")
    print(f"  -> w8a8 vs bf16 speedup: {t_bf16 / t_w8a8:.2f}x")

    # --- 2. k/v padding: 384 vs 304 rows through a chained projection -------
    for rows in (384, 304):
        Rr = 40 * rows
        xr = jnp.asarray(rng.standard_normal((Rr, E)), jnp.bfloat16)

        def step_rows(x):
            y = jnp.dot(x, w_bf16, preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)

        timeit_loop(step_rows, xr, 2 * Rr * E * E, f"proj rows={rows}")


if __name__ == "__main__":
    main()
