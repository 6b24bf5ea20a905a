"""Distribution-level W8A8 acceptance A/B (VERDICT r2 item 5).

``scripts/quant_quality.py`` measures single-forward rel-L2 only; the stated
gate for defaulting quant on is a *distribution-level* metric (FID).  The
released checkpoints are unfetchable in this environment, so this script
builds the stand-in gate end-to-end on synthetic data:

1. trains the tiny mixer on the synthetic InterHuman fixture for a few
   hundred steps (CPU: minutes) so the mixer/influence weights are
   non-degenerate,
2. generates the tiny eval protocol's sample set under three numeric
   configurations — **f32**, **bf16** (the production default compute
   dtype), and **w8a8** (QUANT_FROZEN with the width gate forced open so the
   tiny 32-wide layers actually run int8),
3. scores each against the same GT set with the same seeds and a fixed
   random-init InterCLIP feature map (identical featurizer for all arms, so
   metric DELTAS between arms are meaningful even though absolute values are
   not paper numbers),
4. prints a metric table + deltas vs f32 and writes ``quant_ab.json``.

Run:  python scripts/quant_ab.py [--train-steps 300] [--out quant_ab.json]
The decision rule (recorded in BASELINE.md): w8a8 is acceptable to default
on when its FID delta vs f32 is within the bf16-vs-f32 delta's order of
magnitude — i.e. quantisation noise must not dominate the already-accepted
mixed-precision noise at the distribution level.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-steps", type=int, default=300)
    parser.add_argument("--num-samples", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--out", type=str, default="quant_ab.json")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (default: whatever jax picks)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_system
    from mixermdm_tpu.cli.train_mixermdm import main as train_main
    from mixermdm_tpu.config import Config
    from mixermdm_tpu.data import InterHumanDataset, make_interhuman_fixture
    from mixermdm_tpu.eval import EvalProtocol, EvaluatorWrapper
    from mixermdm_tpu.eval.driver import run_side
    from mixermdm_tpu.eval.interclip import InterCLIP
    from mixermdm_tpu.models.layers import set_w8a8_min_dim
    from mixermdm_tpu.models.torch_compat import TorchEncoder
    from mixermdm_tpu.train.checkpoint import restore_checkpoint

    # ------------------------------------------------------------------ train
    ckpt_dir = "/tmp/quant_ab_train"
    final = os.path.join(ckpt_dir, "final")
    if not os.path.isdir(final):
        print(f"training tiny mixer for {args.train_steps} steps ...")
        train_main(["--tiny", "--out-dir", ckpt_dir,
                    "--max-steps", str(args.train_steps)])
    else:
        print(f"reusing trained checkpoint {final}")

    params = None  # initialised from the first arm's system (same arch)

    # ------------------------------------------------------------- GT fixture
    root = "/tmp/quant_ab_synth"
    make_interhuman_fixture(root, n_clips=args.num_samples, n_frames=40)
    dataset = InterHumanDataset(root, mode="test", max_gt_length=32)
    if len(dataset) == 0:  # fixture may only write a train split
        dataset = InterHumanDataset(root, mode="train", max_gt_length=32)

    # Fixed random featurizer shared by every arm.
    icfg = Config.wrap(
        {"INPUT_DIM": 258, "LATENT_DIM": 32, "FF_SIZE": 64, "NUM_LAYERS": 1,
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
        # Fresh system per arm: compute_dtype is baked into the mixer
        # forward at construction time.
        system = build_system(tiny=True, quant=arm["quant"],
                              compute_dtype=arm["compute_dtype"])
        if params is None:
            params = system.init_params(jax.random.PRNGKey(args.seed))
            params = restore_checkpoint(final, params)
        set_w8a8_min_dim(0 if arm["quant"] else 768)
        metrics = run_side(
            system, params, dataset, wrapper, protocol,
            individual=False, num_samples=args.num_samples,
            batch_size=args.batch_size, max_frames=32,
            replications=1, seed=args.seed, mm_num_samples=0,
            model_name=name,
        )
        results[name] = {
            "FID": float(np.mean(metrics["FID"][name])),
            "MM Distance": float(np.mean(metrics["MM Distance"][name])),
            "R_precision_top1": float(np.mean(metrics["R_precision_top1"][name])),
            "Diversity": float(np.mean(metrics["Diversity"][name])),
        }
    set_w8a8_min_dim(768)

    table = {"arms": results, "deltas_vs_f32": {}}
    for name in ("bf16", "w8a8"):
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
    print(json.dumps(table, indent=2))
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
    print(f"wrote {args.out}")
    return table


if __name__ == "__main__":
    main()
