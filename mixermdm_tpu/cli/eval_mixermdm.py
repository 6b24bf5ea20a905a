"""MixerMDM evaluation CLI: dual-dataset protocol + F-score.

Reference (``/root/reference/src/scripts/eval/mixermdm.py:243-370``):
InterHuman eval (interaction quality) + HumanML3D eval (individual quality),
replicated ``replication_times`` times, combined with the harmonic-mean
F-score.  Constants from :class:`mixermdm_tpu.eval.EvalProtocol`.

Single-dataset variants (reference ``scripts/eval/interaction.py`` /
``individual.py``) via ``--datasets interhuman`` / ``--datasets hml3d``.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate MixerMDM")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--evaluator-checkpoint", type=str, default=None)
    parser.add_argument("--evaluator-individual-checkpoint", type=str, default=None,
                        help="individual-mode InterCLIP (the reference's "
                             "configs/eval_individual.yaml is absent from its repo)")
    parser.add_argument("--data-root", type=str, default="./data")
    parser.add_argument("--hml3d-root", type=str, default="./data/HumanML3D")
    parser.add_argument("--out", type=str, default="eval_results.json")
    parser.add_argument("--datasets", type=str, default="both",
                        choices=["both", "interhuman", "hml3d"])
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument("--replications", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from ..config import Config
    from ..data import InterHumanDataset, make_interhuman_fixture
    from ..eval import (
        EvalProtocol,
        EvaluatorWrapper,
        calculate_f_score,
        evaluate_diversity,
        evaluate_fid,
        evaluate_matching_score,
    )
    from ..eval.interclip import InterCLIP
    from ..train.checkpoint import restore_checkpoint
    from .infer_mixermdm import build_system

    protocol = EvalProtocol()
    replications = args.replications or protocol.replication_times

    if args.tiny:
        root = "/tmp/eval_synth"
        make_interhuman_fixture(root, n_clips=4, n_frames=40)
        args.data_root = root
        num_samples = 4
        batch_size = 2
        max_frames = 16
        icfg = Config.wrap(
            {"INPUT_DIM": 258, "LATENT_DIM": 32, "FF_SIZE": 64, "NUM_LAYERS": 1,
             "NUM_HEADS": 2, "DROPOUT": 0.0, "MODE": "interaction"}
        )
        evaluator = InterCLIP(icfg, text_width=64)
        from ..models.torch_compat import TorchEncoder

        evaluator.text_encoder = TorchEncoder(64, 2, 64, 1)
    else:
        num_samples = args.num_samples or protocol.num_samples
        batch_size = protocol.batch_size_interhuman
        max_frames = 300
        evaluator = InterCLIP()

    system = build_system(args.model, tiny=args.tiny)
    rng = jax.random.PRNGKey(args.seed)
    rng, r1, r2 = jax.random.split(rng, 3)
    params = system.init_params(r1)
    if args.checkpoint:
        params = restore_checkpoint(args.checkpoint, params)
    eval_params = evaluator.init_params(r2)
    if args.evaluator_checkpoint:
        eval_params = restore_checkpoint(args.evaluator_checkpoint, eval_params)
    wrapper = EvaluatorWrapper(evaluator, eval_params)

    evaluator_ind = eval_ind_params = None
    if args.datasets == "both":
        # Individual-mode InterCLIP (MotionEncoder on single-person 262-d).
        from ..config import Config

        ind_cfg = Config.wrap(dict(evaluator.cfg))
        ind_cfg["MODE"] = "individual"
        evaluator_ind = InterCLIP(ind_cfg, text_width=evaluator.text_width)
        if args.tiny:
            from ..models.torch_compat import TorchEncoder

            evaluator_ind.text_encoder = TorchEncoder(64, 2, 64, 1)
        rng, r3 = jax.random.split(rng)
        eval_ind_params = evaluator_ind.init_params(r3)
        if args.evaluator_individual_checkpoint:
            eval_ind_params = restore_checkpoint(
                args.evaluator_individual_checkpoint, eval_ind_params
            )

    dataset = InterHumanDataset(args.data_root, mode="test", max_gt_length=max_frames)
    if len(dataset) == 0:
        raise SystemExit(f"no test data under {args.data_root}")

    metrics_log = defaultdict(lambda: defaultdict(list))
    metrics_ind = defaultdict(lambda: defaultdict(list))
    for rep in range(replications):
        print(f"== replication {rep + 1}/{replications} ==")
        gt_batches, gen_batches, ind_text_batches = [], [], []
        n = min(num_samples, len(dataset))
        for start in range(0, n, batch_size):
            items = [dataset[i] for i in range(start, min(start + batch_size, n))]
            from ..data.loader import collate

            batch = collate(items)
            gt_batches.append(
                (batch["text"], batch["motions"].astype(np.float32), batch["motion_lens"])
            )
            ind_text_batches.append(
                (batch.get("text_individual1", batch["text"]),
                 batch.get("text_individual2", batch["text"]))
            )
            rng, step = jax.random.split(rng)
            T = int(batch["motion_lens"].max())
            motions = np.asarray(
                system.sample(
                    params, system.generate_cond(params, batch), T, step
                )
            )
            pad = batch["motions"].shape[1] - T
            if pad > 0:
                motions = np.pad(motions, ((0, 0), (0, pad), (0, 0)))
            gen_batches.append((batch["text"], motions, batch["motion_lens"]))

        sets = {"mixermdm": gen_batches, "ground truth": gt_batches}
        match, rprec, acts = evaluate_matching_score(sets, wrapper, protocol.top_k)
        fid = evaluate_fid(gt_batches, {"mixermdm": acts["mixermdm"]}, wrapper)
        div_times = min(protocol.diversity_times, acts["mixermdm"].shape[0] - 1)
        div = evaluate_diversity(acts, div_times, seed=args.seed + rep)

        for name in sets:
            metrics_log["MM Distance"][name].append(float(match[name]))
            metrics_log["R_precision_top1"][name].append(float(rprec[name][0]))
            metrics_log["Diversity"][name].append(float(div[name]))
        metrics_log["FID"]["mixermdm"].append(float(fid["mixermdm"]))

        if args.datasets == "both":
            # Individual-quality side (reference eval/mixermdm.py:329-345):
            # the same generations judged per person by the individual
            # evaluator (per-person centring + 2B interleave).
            from ..eval import EvaluatorWrapperIndividual

            ind_wrapper = EvaluatorWrapperIndividual(evaluator_ind, eval_ind_params)
            ind_gen = [
                (interleave_texts(t1, t2), m, l)
                for (t1, t2), (_, m, l) in zip(ind_text_batches, gen_batches)
            ]
            ind_gt = [
                (interleave_texts(t1, t2), m, l)
                for (t1, t2), (_, m, l) in zip(ind_text_batches, gt_batches)
            ]
            m2, r2, a2 = evaluate_matching_score(
                {"mixermdm": ind_gen, "ground truth": ind_gt}, ind_wrapper,
                protocol.top_k,
            )
            f2 = evaluate_fid(ind_gt, {"mixermdm": a2["mixermdm"]}, ind_wrapper)
            d2t = min(protocol.diversity_times, a2["mixermdm"].shape[0] - 1)
            d2 = evaluate_diversity(a2, d2t, seed=args.seed + rep)
            for name in ("mixermdm", "ground truth"):
                metrics_ind["MM Distance"][name].append(float(m2[name]))
                metrics_ind["R_precision_top1"][name].append(float(r2[name][0]))
                metrics_ind["Diversity"][name].append(float(d2[name]))
            metrics_ind["FID"]["mixermdm"].append(float(f2["mixermdm"]))

    summary = {
        metric: {name: [float(np.mean(v)), float(np.std(v))] for name, v in d.items()}
        for metric, d in metrics_log.items()
    }
    if args.datasets == "both" and metrics_ind:
        from ..eval import calculate_f_score

        summary["individual"] = {
            metric: {name: [float(np.mean(v)), float(np.std(v))] for name, v in d.items()}
            for metric, d in metrics_ind.items()
        }
        fscores = calculate_f_score(metrics_log, metrics_ind, replications)
        summary["f_score"] = {
            metric: {name: [float(f), float(ci)] for name, (f, ci) in d.items()}
            for metric, d in fscores.items()
        }
    print(json.dumps(summary, indent=2))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {args.out}")
    return summary


def interleave_texts(t1, t2):
    """Per-person texts interleaved to match the 2B person batch
    (reference evaluation/utils.py:282-301)."""
    out = []
    for a, b in zip(t1, t2):
        out.extend([a, b])
    return out


if __name__ == "__main__":
    main()
