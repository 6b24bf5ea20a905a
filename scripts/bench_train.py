"""Benchmark: full-size MixerMDM adversarial G+D training step on TPU.

Workload = the reference training setting (BASELINE.md: AdamW, batch 64
effective = per-chip 32 x grad-acc 2, T=300, discriminator_steps=1 —
``/root/reference/configs/train/MixerMDM.yaml:7-26``), dispatched as the
fused single-program G+D step (train/trainer.fit_step).

Prints ONE JSON line with the step time and training samples/sec, plus the
Pallas-vs-XLA attention-backward comparison when --compare is given.

Usage:  python scripts/bench_train.py [--batch 32] [--frames 300] [--tiny]
"""

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--compare", action="store_true",
                   help="also time the XLA attention-backward path")
    p.add_argument("--xla-attn", action="store_true",
                   help="time with XLA attention everywhere (no Pallas fwd)")
    p.add_argument("--bf16-moments", action="store_true",
                   help="store the Adam first moment in bf16 (HBM-traffic A/B)")
    p.add_argument("--quant-train", action="store_true",
                   help="W8A8 the frozen denoiser forwards inside the "
                        "training loss (QUANT_TRAIN)")
    p.add_argument("--no-remat", action="store_true",
                   help="disable scan-body remat for the differentiated "
                        "stacks (trade HBM for recompute)")
    p.add_argument("--remat-policy", type=str, default=None,
                   choices=("dots", "dots_all"),
                   help="jax.checkpoint policy for the scan-body remat: "
                        "'dots' saves matmul outputs (no backward "
                        "re-matmuls, elementwise still recomputed); "
                        "'dots_all' also saves the attention matmuls")
    p.add_argument("--f32-disc", action="store_true",
                   help="keep discriminator compute f32 (default: bf16 on "
                        "TPU, like the reference's 16-mixed)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ".")
    from bench import build_system
    from mixermdm_tpu.train.trainer import MixerTrainer
    from mixermdm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B = 2 if args.tiny else args.batch
    T = 16 if args.tiny else args.frames

    system = build_system(tiny=args.tiny)
    if args.quant_train:
        system.quant_train = True
    if args.f32_disc:
        system.disc_compute_dtype = None
    if args.no_remat:
        from mixermdm_tpu.models.layers import set_remat_scan

        set_remat_scan(False)
    if args.remat_policy:
        from mixermdm_tpu.models.layers import set_remat_policy

        set_remat_policy(args.remat_policy)
    params = system.init_params(jax.random.PRNGKey(0))
    trainer = MixerTrainer(system, grad_acc_steps=2, discriminator_steps=1,
                           donate=True,
                           mu_dtype=jnp.bfloat16 if args.bf16_moments else None)
    state = trainer.init_state(params)

    rng = np.random.default_rng(0)
    tok_len = 77
    batch = {
        "motions": jnp.asarray(rng.normal(size=(B, T, 2 * 262)), jnp.float32),
        "motion_lens": jnp.asarray(rng.integers(T // 2, T, size=(B,)), jnp.int32),
        "tokens_inter": jnp.asarray(rng.integers(0, 100, size=(B, tok_len)), jnp.int32),
        "tokens_i1": jnp.asarray(rng.integers(0, 100, size=(B, tok_len)), jnp.int32),
        "tokens_i2": jnp.asarray(rng.integers(0, 100, size=(B, tok_len)), jnp.int32),
    }

    def time_steps(label):
        # The train state is DONATED into the step, so thread it like a
        # real training loop (never reuse a consumed state) — and give each
        # run its own device copy of the params (donation would otherwise
        # delete the shared buffers between --compare runs).
        import jax as _jax

        st = trainer.init_state(_jax.tree_util.tree_map(jnp.array, params))
        key = jax.random.PRNGKey(1)
        st, g, d = trainer.fit_step(st, batch, key, 0)   # compile
        jax.block_until_ready(g["total"])
        times = []
        for i in range(args.repeats):
            key = jax.random.PRNGKey(2 + i)
            t0 = time.perf_counter()
            st, g, d = trainer.fit_step(st, batch, key, 0)
            jax.block_until_ready(g["total"])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"# {label}: step={best*1e3:.1f} ms  "
              f"({B / best:.1f} samples/sec/chip)", file=sys.stderr)
        return best

    from mixermdm_tpu.train import trainer as TR

    results = {}
    if args.xla_attn or args.compare:
        TR.set_train_attention("xla")
        results["xla_attn_step_ms"] = round(
            time_steps("XLA attention (training default)") * 1e3, 1)
        if not args.compare:
            print(json.dumps({
                "metric": f"G+D step, XLA attention (B={B}, T={T})",
                "value": results["xla_attn_step_ms"], "unit": "ms/step",
            }))
            return
        TR.set_train_attention("pallas")
        trainer = MixerTrainer(system, grad_acc_steps=2, discriminator_steps=1,
                               donate=True)

    qt = ", quant-train" if args.quant_train else ""
    qt += ", no-remat" if args.no_remat else ""
    qt += f", remat={args.remat_policy}" if args.remat_policy else ""
    qt += ", f32-disc" if args.f32_disc else ""
    best = time_steps(f"{TR.TRAIN_ATTENTION} attention path{qt}")
    results.update({
        "metric": f"mixermdm fused G+D training step (B={B}, T={T}, "
                  f"attn={TR.TRAIN_ATTENTION}{qt})",
        "value": round(best * 1e3, 1),
        "unit": "ms/step",
        "samples_per_sec": round(B / best, 2),
    })
    print(json.dumps(results))


if __name__ == "__main__":
    main()
