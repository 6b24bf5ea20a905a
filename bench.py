"""Benchmark: full-size MixerMDM two-person generation throughput on TPU.

Workload = the reference CLI's generation setting (SURVEY.md §6 /
``/root/reference/src/scripts/infer/mixermdm.py:73,184``): batch of 10
samples, 299-frame window, DDIM-50 with CFG weight 3.5, production model
sizes (in2IN denoisers 1024-d/8-layer, mixer 512-d/4-block, mixing mode 4).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

``vs_baseline`` compares against REFERENCE_SAMPLES_PER_SEC — an *estimate* of
the reference PyTorch pipeline on a modern GPU, since the reference repo
publishes no throughput numbers anywhere (BASELINE.md): 50 Python-stepped
DDIM iterations x [2x CFG x (2 individual fwd + 1 interaction fwd + 2
influence fwd) + per-step normalize/align] ≈ 2 s/sample batch-10 → 5
samples/s.  Replace with a measured number when reference hardware exists.
"""

import json
import time

import numpy as np

REFERENCE_SAMPLES_PER_SEC = 5.0  # documented estimate, see module docstring

B = 10          # samples per prompt (infer CLI default)
T = 299         # window (infer CLI default)
DDIM_STEPS = 50


def build_system(tiny: bool = False, quant: bool | None = None, steps: int | None = None,
                 compute_dtype: str = "auto"):
    """``quant=None`` keeps the config default (W8A8 ON since the quant_ab
    acceptance gate); ``quant=False`` forces the bf16-only path."""
    from mixermdm_tpu.config import MIXERMDM_DEFAULT, IN2IN_INDIVIDUAL_DEFAULT, IN2IN_INTERACTION_DEFAULT, tiny_config
    from mixermdm_tpu.models.clip_text import ClipTextConfig
    from mixermdm_tpu.systems import In2INSystem, MixerMDMSystem

    if tiny:
        clip_cfg = ClipTextConfig.tiny()
        c = tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8)
        m1 = In2INSystem(c, mode="individual", clip_cfg=clip_cfg)
        m2 = In2INSystem(c, mode="interaction", clip_cfg=clip_cfg)
        from mixermdm_tpu.config import Config
        mcfg = Config.wrap(dict(MIXERMDM_DEFAULT))
        mcfg["DIFFUSION_STEPS"] = 8
        mcfg["STRATEGY"] = "ddim4"
        mcfg["GENERATOR"] = Config.wrap({"NUM_LAYERS": 1, "NUM_HEADS": 2, "DROPOUT": 0.0,
                                          "INPUT_DIM": 262, "LATENT_DIM": 32, "FF_SIZE": 64})
        mcfg["DISCRIMINATOR"] = mcfg["GENERATOR"]
        if quant is not None:
            mcfg["QUANT_FROZEN"] = bool(quant)
        return MixerMDMSystem(mcfg, model1=m1, model2=m2, clip_cfg=clip_cfg,
                              compute_dtype=compute_dtype)

    clip_cfg = ClipTextConfig.vit_l_14()
    m1 = In2INSystem(IN2IN_INDIVIDUAL_DEFAULT, mode="individual", clip_cfg=clip_cfg)
    m2 = In2INSystem(IN2IN_INTERACTION_DEFAULT, mode="interaction", clip_cfg=clip_cfg)
    mcfg = MIXERMDM_DEFAULT
    if quant is not None or steps:
        from mixermdm_tpu.config import Config
        mcfg = Config.wrap(dict(mcfg))
        if quant is not None:
            mcfg["QUANT_FROZEN"] = bool(quant)
        if steps:
            # --steps 1000 = the un-respaced full chain (the north-star
            # "two-person 1000-step generation" workload in BASELINE.json).
            mcfg["STRATEGY"] = f"ddim{steps}"
    return MixerMDMSystem(mcfg, model1=m1, model2=m2, clip_cfg=clip_cfg,
                          compute_dtype=compute_dtype)


def main(tiny: bool = False, repeats: int = 3, quant: bool | None = None,
         steps: int | None = None):
    import jax
    import jax.numpy as jnp

    from mixermdm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    system = build_system(tiny, quant=quant, steps=steps)
    params = system.init_params(jax.random.PRNGKey(0))

    b = 2 if tiny else B
    t = 16 if tiny else T
    cond = jax.random.normal(jax.random.PRNGKey(1), (b, 8 * system.text_dim))

    # Warm-up / compile — and a sanity check that we are not timing NaN/inf
    # propagation (fresh zero-init models emit ~0, never non-finite).
    rng = jax.random.PRNGKey(2)
    out = system.sample(params, cond, t, rng)
    jax.block_until_ready(out)
    assert bool(jnp.isfinite(out).all()), "benchmark output is not finite"

    times = []
    for i in range(repeats):
        rng = jax.random.PRNGKey(3 + i)
        start = time.perf_counter()
        out = system.sample(params, cond, t, rng)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - start)

    best = min(times)
    samples_per_sec = b / best
    n_steps = system.sample_schedule.num_timesteps
    result = {
        "metric": f"mixermdm two-person ddim{n_steps} generation (B={b}, T={t})",
        "value": round(samples_per_sec, 4),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 4),
        # e2e latency for the whole batch-b generation call (what a CLI user
        # waits for one prompt's samples).
        "e2e_latency_s": round(best, 4),
    }

    # MFU estimate (BASELINE.md tracks the 195-197 TFLOP/s bf16 ceiling
    # measured on this chip).  Two cost-analysis pitfalls force an indirect
    # route: (a) the hot matmuls live inside Pallas custom calls, whose
    # flops XLA cost analysis cannot see; (b) the DDIM chain is a lax.scan,
    # whose body the analysis counts ONCE.  So: lower an all-XLA variant of
    # the same chain (un-compiled HLO analysis — flops are architectural,
    # not backend-optimised), take its per-body flops x num steps, and
    # divide by the FUSED path's measured time.
    try:
        from functools import partial as _partial

        from mixermdm_tpu.models.layers import (
            set_fused_blocks,
            set_pallas_attention,
        )

        set_fused_blocks(False)
        set_pallas_attention(False)
        try:
            fiv_val = jnp.float32(0.0)
            lowered = jax.jit(
                _partial(system._sample_impl, n_frames=t,
                         collect_influence=False, use_fiv=False)
            ).lower(params, cond, rng, fiv_val, None, None)
            cost = lowered.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
        finally:
            set_fused_blocks(True)
            set_pallas_attention(None)
        if flops > 0:
            total = flops * n_steps  # scan body counted once by the analysis
            tflops_s = total / best / 1e12
            result["tflops_per_s"] = round(tflops_s, 2)
            result["mfu_vs_bf16_peak_pct"] = round(100.0 * tflops_s / 197.0, 2)
    except Exception:
        pass  # cost analysis is best-effort (backend-dependent)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    import sys

    steps = None
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    quant = None  # config default (ON)
    if "--quant" in sys.argv:
        quant = True
    if "--no-quant" in sys.argv:
        quant = False
    main(tiny="--tiny" in sys.argv, quant=quant, steps=steps)
