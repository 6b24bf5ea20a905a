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

# Documented ESTIMATE (module docstring) of the reference on a modern GPU —
# no reference hardware exists here, so vs_baseline is an estimate-ratio.
# Measured context (refcpu_ab.json, BASELINE.md round 5): on the SAME host
# CPU at full size with identical weights, the live torch reference chain
# beats our XLA:CPU chain 0.80x (50.5 vs 62.8 s/step; both GEMM-bound,
# MKL > XLA:CPU codegen) — i.e. the TPU wins come from hardware + Pallas/
# bf16/int8 kernels, not from the framework design per se.
REFERENCE_SAMPLES_PER_SEC = 5.0

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




def estimate_chain_flops(system, B: int, T: int, split: bool = False):
    """Analytic matmul FLOPs of one full sampling call (all steps).

    Counts the dominant dense ops of the per-step mixer forward at the
    CFG-doubled batch: the two frozen in2IN denoisers, the mixer/influence
    core, and the stream embeddings; elementwise geometry is ignored
    (<<1% of FLOPs).  2*M*N*K per (M,K)x(K,N) matmul.

    With ``split=True`` returns ``(int8_flops, bf16_flops)``: projections
    and FFNs of modules whose latent dim clears the w8a8 width gate run on
    the MXU's int8 path when QUANT_FROZEN is on; attention matmuls (qk^T,
    av) always stay bf16.  Needed for honest DUAL-PEAK MFU — quoting int8
    work against the bf16 ceiling overstates proximity to the hardware.
    """
    from mixermdm_tpu.models import layers as _layers

    # quant_frozen alone decides: the sample path enters w8a8_scope(...) at
    # trace time (the _W8A8 global is only True INSIDE that trace).
    quant_on = bool(getattr(system, "quant_frozen", False))
    gate = _layers._W8A8_MIN_DIM
    acc = {"int8": 0.0, "bf16": 0.0}

    def proj(tokens, k, n, E_gate):
        key = "int8" if (quant_on and E_gate >= gate) else "bf16"
        acc[key] += 2.0 * tokens * k * n

    def sa(tokens, T_seq, E):
        # q,k,v,out projections (quantisable) + qk^T + av (always bf16)
        for _ in range(4):
            proj(tokens, E, E, E)
        acc["bf16"] += 2 * (tokens * T_seq * E) * 2

    def ffn(tokens, E, FF):
        proj(tokens, E, FF, E)
        proj(tokens, FF, E, E)

    cfg1 = system.model1.cfg   # individual denoiser
    cfg2 = system.model2.cfg   # interaction denoiser
    g = system.cfg.GENERATOR
    F = int(system.nfeats)

    Bc = 2 * B                        # CFG cond/uncond batching
    n_steps = system.sample_schedule.num_timesteps

    # individual denoiser: person-stacked 2*Bc batch, blocks = SA + FFN
    E1, FF1, L1 = int(cfg1.LATENT_DIM), int(cfg1.FF_SIZE), int(cfg1.NUM_LAYERS)
    tok1 = 2 * Bc * T
    for _ in range(L1):
        sa(tok1, T, E1)
        ffn(tok1, E1, FF1)
    proj(tok1, F, E1, 0)                                    # in/out process
    proj(tok1, E1, F, 0)

    # interaction denoiser: Bc batch, two person streams, SA + CA + FFN each
    E2, FF2, L2 = int(cfg2.LATENT_DIM), int(cfg2.FF_SIZE), int(cfg2.NUM_LAYERS)
    tok2 = 2 * Bc * T                                       # 2 streams
    for _ in range(L2):
        sa(tok2, T, E2)
        sa(tok2, T, E2)                                     # cross-person CA
        ffn(tok2, E2, FF2)
    proj(tok2, F, E2, 0)
    proj(tok2, E2, F, 0)

    # mixer / influence core: 4 stream embeddings + per-person stacks of
    # InfluenceBlockCross (SA + CA + FFN) + the 23-way head
    Eg, FFg, Lg = int(g.LATENT_DIM), int(g.FF_SIZE), int(g.NUM_LAYERS)
    tokg = Bc * T
    for _ in range(4):
        proj(tokg, F, Eg, 0)                                # stream embeds
    for _ in range(2 * Lg):                                 # per person
        sa(tokg, T, Eg)
        sa(tokg, T, Eg)                                     # CA
        ffn(tokg, Eg, FFg)
    proj(tokg, Eg, 23, 0)
    proj(tokg, Eg, 23, 0)

    int8_f = float(n_steps) * acc["int8"]
    bf16_f = float(n_steps) * acc["bf16"]
    if split:
        return int8_f, bf16_f
    return int8_f + bf16_f

def main(tiny: bool = False, repeats: int = 3, quant: bool | None = None,
         steps: int | None = None, quant_min_dim: int | None = None,
         batch: int | None = None, sampler: str | None = None):
    import jax
    import jax.numpy as jnp

    from mixermdm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if quant_min_dim is not None:
        # Experiment knob: lower the int8 width gate (default 768) so the
        # E=512 mixer/influence core also quantises (VERDICT r2 item 10).
        from mixermdm_tpu.models.layers import set_w8a8_min_dim

        set_w8a8_min_dim(quant_min_dim)

    system = build_system(tiny, quant=quant, steps=steps)
    if sampler:
        from mixermdm_tpu.systems import apply_sampler_overrides

        apply_sampler_overrides(system, sampler)
    params = system.init_params(jax.random.PRNGKey(0))

    b = batch or (2 if tiny else B)
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
        "metric": f"mixermdm two-person {system.sampler_type}{n_steps} "
                  f"generation (B={b}, T={t})",
        "value": round(samples_per_sec, 4),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 4),
        # e2e latency for the whole batch-b generation call (what a CLI user
        # waits for one prompt's samples).
        "e2e_latency_s": round(best, 4),
    }

    # MFU estimate (BASELINE.md tracks the 195-197 TFLOP/s bf16 ceiling
    # measured on this chip; int8 projections run at 2x that rate).  Neither
    # backend cost analysis works here: the hot matmuls live inside Pallas
    # custom calls (invisible to XLA cost analysis), the chain is a lax.scan
    # (body counted once), and the axon backend returns None from
    # Lowered.cost_analysis().  So count the architecture's matmul FLOPs
    # analytically.  The headline MFU is DUAL-PEAK (VERDICT r3 weak #3):
    # achieved time vs the analytic floor with int8 projections at 394 TF/s
    # and everything bf16 at 197 TF/s — "% of bf16 peak" alone overstates
    # proximity to the hardware when most FLOPs ride the int8 path.
    try:
        int8_tf, bf16_tf = (
            f / 1e12 for f in estimate_chain_flops(system, b, t, split=True)
        )
        tflops = int8_tf + bf16_tf
        tflops_s = tflops / best
        sol_s = int8_tf / 394.0 + bf16_tf / 197.0   # dual-peak floor (s)
        result["model_tflops"] = round(tflops, 2)
        result["model_tflops_int8"] = round(int8_tf, 2)
        result["tflops_per_s"] = round(tflops_s, 2)
        result["mfu_dual_peak_pct"] = round(100.0 * sol_s / best, 2)
        result["mfu_vs_bf16_peak_pct"] = round(100.0 * tflops_s / 197.0, 2)
    except Exception as e:
        import sys as _sys

        print(f"(mfu estimate unavailable: {type(e).__name__}: {e})",
              file=_sys.stderr)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    import sys

    steps = None
    if "--steps" in sys.argv and "--sample-steps" in sys.argv:
        print("error: --steps and --sample-steps are aliases; pass only one",
              file=sys.stderr)
        raise SystemExit(2)
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    if "--sample-steps" in sys.argv:  # alias matching the infer/serve CLIs
        steps = int(sys.argv[sys.argv.index("--sample-steps") + 1])
    quant = None  # config default (ON)
    if "--quant" in sys.argv:
        quant = True
    if "--no-quant" in sys.argv:
        quant = False
    qmd = None
    if "--quant-min-dim" in sys.argv:
        qmd = int(sys.argv[sys.argv.index("--quant-min-dim") + 1])
    batch = None
    if "--batch" in sys.argv:
        # Serving-throughput knob (the driver metric stays at the reference
        # CLI's B=10): bigger generation batches fill the kernels' grids
        # further — see the BASELINE.md throughput-vs-batch row.
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    sampler = None
    if "--sampler" in sys.argv:
        # "dpmpp" = DPM-Solver++(2M); pair with --steps 25 for the
        # half-the-model-calls serving row (the driver metric stays ddim50).
        sampler = sys.argv[sys.argv.index("--sampler") + 1]
    main(tiny="--tiny" in sys.argv, quant=quant, steps=steps,
         quant_min_dim=qmd, batch=batch, sampler=sampler)
