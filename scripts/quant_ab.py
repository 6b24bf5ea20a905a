"""Distribution-level W8A8 acceptance A/B (VERDICT r2 item 5).

``scripts/quant_quality.py`` measures single-forward rel-L2 only; the stated
gate for defaulting quant on is a *distribution-level* metric (FID).  The
released checkpoints are unfetchable in this environment, so this script
builds the stand-in gate end-to-end on synthetic data:

1. builds a SMALL-but-fusable mixer stack (128-d denoisers — the int8 fused
   kernels need 128-multiple widths, so the 32-wide test config can never
   exercise them; 128 is the smallest production-shaped width),
2. trains it adversarially on the synthetic InterHuman fixture for a few
   hundred steps so the mixer/influence weights are non-degenerate,
3. generates the tiny eval protocol's sample set under three numeric
   configurations — **f32**, **bf16** (the production default compute
   dtype), and **w8a8** (QUANT_FROZEN with the width gate forced down to
   128 so the small denoisers actually run int8),
4. scores each against the same GT set with the same seeds and a fixed
   random-init InterCLIP feature map (identical featurizer for all arms, so
   metric DELTAS between arms are meaningful even though absolute values
   are not paper numbers),
5. prints a metric table + deltas vs f32 and writes ``quant_ab.json``.

Must run on TPU (the int8 path lives in the Pallas fused kernels).

Run:  python scripts/quant_ab.py [--train-steps 200] [--out quant_ab.json]
Decision rule (recorded in BASELINE.md): w8a8 is acceptable to default on
when its FID delta vs f32 is within ~an order of magnitude of the
bf16-vs-f32 delta — quantisation noise must not dominate the already-
accepted mixed-precision noise at the distribution level.

``--train-arm`` additionally gates the QUANT_TRAIN knob (int8 frozen
denoiser forwards inside the adversarial TRAINING loss): it trains a second
mixer from the same seed with QUANT_TRAIN on, evaluates BOTH trainings under
identical f32 sampling, and reports the metric deltas attributable to
training against int8 frozen outputs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LATENT = 128
T_WINDOW = 32


def make_system(compute_dtype: str, quant: bool):
    from mixermdm_tpu.config import Config, tiny_config
    from mixermdm_tpu.models.clip_text import ClipTextConfig
    from mixermdm_tpu.systems import In2INSystem, MixerMDMSystem

    clip_cfg = ClipTextConfig.tiny()
    c = tiny_config(latent=LATENT, layers=2, heads=2, diffusion_steps=50)
    c["STRATEGY"] = "ddim10"  # tiny_config's 50//4 stride does not divide 50
    m1 = In2INSystem(c, mode="individual", clip_cfg=clip_cfg)
    m2 = In2INSystem(c, mode="interaction", clip_cfg=clip_cfg)
    mcfg = Config.wrap(
        {
            "NAME": "MixerMDM",
            "GENERATOR": {"NUM_LAYERS": 2, "NUM_HEADS": 2, "DROPOUT": 0.0,
                          "INPUT_DIM": 262, "LATENT_DIM": LATENT,
                          "FF_SIZE": 2 * LATENT},
            "DISCRIMINATOR": {"NUM_LAYERS": 1, "NUM_HEADS": 2, "DROPOUT": 0.0,
                              "INPUT_DIM": 262, "LATENT_DIM": 64, "FF_SIZE": 128},
            "ACTIVATION": "gelu", "DIFFUSION_STEPS": 50,
            "BETA_SCHEDULER": "cosine", "SAMPLER": "uniform",
            "MOTION_REP": "global", "T_BAR": 25, "STRATEGY": "ddim10",
            "CFG_WEIGHT": 3.5, "MIXING_MODE": 4, "FORCE_INFLUENCE_VAL": None,
            "QUANT_FROZEN": quant,
        }
    )
    return MixerMDMSystem(mcfg, model1=m1, model2=m2, clip_cfg=clip_cfg,
                          compute_dtype=compute_dtype)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-steps", type=int, default=200)
    parser.add_argument("--num-samples", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--out", type=str, default="quant_ab.json")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--train-arm", action="store_true",
                        help="also train a QUANT_TRAIN mixer and compare "
                             "both trainings under identical f32 sampling")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from mixermdm_tpu.config import Config
    from mixermdm_tpu.data import DataLoader, InterHumanDataset, make_interhuman_fixture
    from mixermdm_tpu.eval import EvalProtocol, EvaluatorWrapper
    from mixermdm_tpu.eval.driver import run_side
    from mixermdm_tpu.eval.interclip import InterCLIP
    from mixermdm_tpu.models import layers as _L
    from mixermdm_tpu.models.layers import set_w8a8_min_dim
    _DEFAULT_GATE = _L._W8A8_MIN_DIM
    from mixermdm_tpu.models.torch_compat import TorchEncoder
    from mixermdm_tpu.train.trainer import MixerTrainer
    from mixermdm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # ------------------------------------------------------------------ train
    root = "/tmp/quant_ab_synth"
    make_interhuman_fixture(root, n_clips=max(8, args.num_samples),
                            n_frames=40, test_all=True)

    def train_mixer(quant_train: bool):
        train_sys = make_system("bf16", quant=False)
        train_sys.quant_train = quant_train
        if quant_train:
            set_w8a8_min_dim(LATENT)  # the 128-d denoisers must engage int8
        try:
            params0 = train_sys.init_params(jax.random.PRNGKey(args.seed))
            dataset = InterHumanDataset(root, mode="train",
                                        max_gt_length=T_WINDOW)
            loader = DataLoader(dataset, batch_size=4, seed=args.seed)
            trainer = MixerTrainer(train_sys, grad_acc_steps=1,
                                   discriminator_steps=1)
            state = trainer.init_state(params0)
            print(f"training small mixer ({LATENT}-d, "
                  f"quant_train={quant_train}) for {args.train_steps} steps ...")
            step = 0
            rng = jax.random.PRNGKey(args.seed + 7)
            while step < args.train_steps:
                for batch in loader:
                    toks = train_sys.tokenize_batch(batch)
                    dev_batch = {
                        "motions": np.asarray(batch["motions"], np.float32),
                        "motion_lens": np.asarray(batch["motion_lens"]),
                        "tokens_inter": np.asarray(toks["tokens_inter"]),
                        "tokens_i1": np.asarray(toks["tokens_i1"]),
                        "tokens_i2": np.asarray(toks["tokens_i2"]),
                    }
                    state, g_losses, _ = trainer.fit_step(
                        state, dev_batch, jax.random.fold_in(rng, step), step
                    )
                    step += 1
                    if step % 50 == 0:
                        print(f"  step {step}: "
                              f"g_total={float(g_losses['total']):.4f}")
                    if step >= args.train_steps:
                        break
            return jax.device_get(state.params)
        finally:
            set_w8a8_min_dim(_DEFAULT_GATE)

    params = train_mixer(quant_train=False)

    # ------------------------------------------------------------------- eval
    gt = InterHumanDataset(root, mode="test", max_gt_length=T_WINDOW)
    icfg = Config.wrap(
        {"INPUT_DIM": 258, "LATENT_DIM": 64, "FF_SIZE": 128, "NUM_LAYERS": 1,
         "NUM_HEADS": 2, "DROPOUT": 0.0, "MODE": "interaction"}
    )
    evaluator = InterCLIP(icfg, text_width=64)
    evaluator.text_encoder = TorchEncoder(64, 2, 64, 1)
    eval_params = evaluator.init_params(jax.random.PRNGKey(123))
    wrapper = EvaluatorWrapper(evaluator, eval_params)
    protocol = EvalProtocol()

    arms = {
        "f32": dict(compute_dtype="f32", quant=False),
        "bf16": dict(compute_dtype="bf16", quant=False),
        "w8a8": dict(compute_dtype="bf16", quant=True),
    }
    results = {}
    for name, arm in arms.items():
        print(f"=== arm {name} ===")
        system = make_system(arm["compute_dtype"], arm["quant"])
        set_w8a8_min_dim(LATENT if arm["quant"] else _DEFAULT_GATE)
        metrics = run_side(
            system, params, gt, wrapper, protocol,
            individual=False, num_samples=args.num_samples,
            batch_size=args.batch_size, max_frames=T_WINDOW,
            replications=1, seed=args.seed, mm_num_samples=0,
            model_name=name,
        )
        results[name] = {
            "FID": float(np.mean(metrics["FID"][name])),
            "MM Distance": float(np.mean(metrics["MM Distance"][name])),
            "R_precision_top1": float(np.mean(metrics["R_precision_top1"][name])),
            "Diversity": float(np.mean(metrics["Diversity"][name])),
        }
    set_w8a8_min_dim(_DEFAULT_GATE)

    if args.train_arm:
        # Train a second mixer against int8 frozen outputs; score it under
        # the SAME f32 sampling + featurizer.  The delta vs the baseline
        # training isolates the training-time quantisation effect.
        params_qt = train_mixer(quant_train=True)
        print("=== arm f32(qt-trained) ===")
        system = make_system("f32", quant=False)
        metrics = run_side(
            system, params_qt, gt, wrapper, protocol,
            individual=False, num_samples=args.num_samples,
            batch_size=args.batch_size, max_frames=T_WINDOW,
            replications=1, seed=args.seed, mm_num_samples=0,
            model_name="qt",
        )
        results["f32_quant_trained"] = {
            "FID": float(np.mean(metrics["FID"]["qt"])),
            "MM Distance": float(np.mean(metrics["MM Distance"]["qt"])),
            "R_precision_top1": float(np.mean(metrics["R_precision_top1"]["qt"])),
            "Diversity": float(np.mean(metrics["Diversity"]["qt"])),
        }

    table = {"arms": results, "deltas_vs_f32": {}}
    for name in results:
        if name == "f32":
            continue
        table["deltas_vs_f32"][name] = {
            k: round(results[name][k] - results["f32"][k], 6)
            for k in results["f32"]
        }
    d_bf16 = abs(table["deltas_vs_f32"]["bf16"]["FID"])
    d_w8a8 = abs(table["deltas_vs_f32"]["w8a8"]["FID"])
    table["gate"] = {
        "fid_delta_bf16": d_bf16,
        "fid_delta_w8a8": d_w8a8,
        "w8a8_within_10x_of_bf16": bool(d_w8a8 <= 10 * max(d_bf16, 1e-9)),
    }
    if "f32_quant_trained" in results:
        d_qt = abs(table["deltas_vs_f32"]["f32_quant_trained"]["FID"])
        table["gate"]["fid_delta_quant_trained"] = d_qt
        table["gate"]["quant_train_within_10x_of_bf16"] = bool(
            d_qt <= 10 * max(d_bf16, 1e-9)
        )
    print(json.dumps(table, indent=2))
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
    print(f"wrote {args.out}")
    return table


if __name__ == "__main__":
    main()
