"""Per-kernel microbench of the fused Pallas sub-blocks at production shapes.

Times each fused block (SA / CA / FFN) at the exact shapes the sampling
chain dispatches, bf16 vs W8A8, and prints achieved TFLOP/s vs the analytic
speed-of-light — this is how we decide which kernel still has headroom
(BASELINE.md round-3 breakdown).

The driver workload (B=10 samples, CFG-doubled to 20) person-stacks BOTH
denoisers' streams into the batch (blocks.py:172-179 interaction;
mixer.py:172-188 individual), so every fused dispatch in the real chain
runs at 2B=40: the in2IN denoisers at E=1024/H=8/F=2048 and the mixer
core + influence net at E=512/H=8/F=1024 (configs/models/MixerMDM.yaml).

Usage: python scripts/microbench_fused.py   (idle machine, one TPU chip)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

BF16_PEAK = 197e12  # v5e MXU bf16
INT8_PEAK = 394e12


INNER = 200  # kernel applications per dispatch — amortises the axon RPC
# floor (~25 ms per dispatch; at 200 iterations it is ~0.13 ms/kernel noise,
# and we additionally time a null chain and subtract it).


def timeit(fn, *args, iters=3):
    """fn must already iterate the kernel INNER times in-graph (the real
    chain dispatches kernels back-to-back inside one scan; timing single
    dispatches would measure the RPC floor, not the kernel)."""
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
    """Wrap a block fn into an in-graph INNER-step iteration on x.

    The output is renormalised each step: iterating an un-normalised
    residual block explodes to inf/NaN in a few steps and the W8A8 kernels'
    VPU quantisation path slows down dramatically on non-finite values
    (measured 4x) — real chains never feed the kernels non-finite data.
    """

    @jax.jit
    def run(x, *rest):
        def body(h, _):
            h = kernel_fn(h, *rest)
            return h / (jnp.abs(h).max() + 1e-3), None

        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h

    return run


def main():
    from mixermdm_tpu.utils.cache import enable_compilation_cache
    from mixermdm_tpu.ops.fused_block import (
        fused_ca_block, fused_ffn_block, fused_sa_block,
    )

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    T = 299

    def arr(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.05, jnp.bfloat16)

    for B, E, H, F, tag in (
        (40, 1024, 8, 2048, "in2IN denoisers (person-stacked 2B=40)"),
        (40, 512, 8, 1024, "mixer core / influence (2B=40)"),
    ):
        x = arr(B, T, E)
        sc, sh = arr(B, E), arr(B, E)
        ws = [jnp.asarray(rng.standard_normal((E, E)) * 0.02, jnp.float32)
              for _ in range(4)]
        bs = [jnp.asarray(rng.standard_normal(E) * 0.02, jnp.float32)
              for _ in range(4)]
        w1 = jnp.asarray(rng.standard_normal((E, F)) * 0.02, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(F) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((F, E)) * 0.02, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(E) * 0.02, jnp.float32)
        kpm = jnp.zeros((B, T), bool)

        Tp = ((T + 7) // 8) * 8
        proj_flops = 8 * B * Tp * E * E
        attn_flops = 4 * B * Tp * Tp * E
        ffn_flops = 4 * B * Tp * E * F

        sa_bf = chain(lambda h, sc, sh: fused_sa_block(
            h, sc, sh, *sum(zip(ws, bs), ()), kpm, n_heads=H, residual=True))
        sa_q8 = chain(lambda h, sc, sh: fused_sa_block(
            h, sc, sh, *sum(zip(ws, bs), ()), kpm, n_heads=H, residual=True,
            quant=True))
        ca_bf = chain(lambda h, xf, sc, sh: fused_ca_block(
            h, xf, sc, sh, sc, sh, *sum(zip(ws, bs), ()), kpm, n_heads=H,
            residual=True))
        ca_q8 = chain(lambda h, xf, sc, sh: fused_ca_block(
            h, xf, sc, sh, sc, sh, *sum(zip(ws, bs), ()), kpm, n_heads=H,
            residual=True, quant=True))
        ffn_bf = chain(lambda h, sc, sh: fused_ffn_block(
            h, sc, sh, w1, b1, w2, b2, residual=True))
        ffn_q8 = chain(lambda h, sc, sh: fused_ffn_block(
            h, sc, sh, w1, b1, w2, b2, residual=True, quant=True))

        null = chain(lambda h: h)          # renorm + scan + dispatch overhead
        base = timeit(null, x)
        print(f"--- {tag} (T={T}, E={E}, H={H}, F={F}) ---")
        print(f"overhead  {base * 1e3:7.3f} ms/iter (subtracted)")
        for name, fn, args, flops in (
            ("sa bf16", sa_bf, (x, sc, sh), proj_flops + attn_flops),
            ("sa w8a8", sa_q8, (x, sc, sh), proj_flops + attn_flops),
            ("ca bf16", ca_bf, (x, x, sc, sh), proj_flops + attn_flops),
            ("ca w8a8", ca_q8, (x, x, sc, sh), proj_flops + attn_flops),
            ("ffn bf16", ffn_bf, (x, sc, sh), ffn_flops),
            ("ffn w8a8", ffn_q8, (x, sc, sh), ffn_flops),
        ):
            dt = max(timeit(fn, *args) - base, 1e-9)
            peak = INT8_PEAK if "w8a8" in name else BF16_PEAK
            # attention matmuls stay bf16 in the w8a8 kernels
            sol = (proj_flops / peak + attn_flops / BF16_PEAK
                   if "sa" in name or "ca" in name else flops / peak)
            print(f"{name:9s} {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s"
                  f"  speed-of-light {sol * 1e3:6.3f} ms"
                  f"  ({100 * sol / dt:4.1f}% of SoL)")


if __name__ == "__main__":
    main()
