"""MixerMDM evaluation CLI: dual-dataset protocol + F-score.

Reference (``/root/reference/src/scripts/eval/mixermdm.py:243-370``): two
independent evaluations — InterHuman (interaction quality, ``EvaluatorModel
Wrapper``) and HumanML3D (individual quality, ``EvaluatorModelWrapper
Individual``; the mixer GENERATES from HumanML3D texts, :330-345) — each with
MM-Distance, R-precision top-1/2/3, FID, Diversity and MultiModality over
``replication_times`` replications, then the harmonic-mean F-score (:216-241).
Constants from :class:`mixermdm_tpu.eval.EvalProtocol`.

Single-dataset variants (reference ``scripts/eval/interaction.py`` /
``individual.py``) via ``--datasets interhuman`` / ``--datasets hml3d``.

Generation-length policy: by default items are generated at the batch-max
length and scored at their own GT length (batched jitted sampling — the
reference loops batch=1 generating each item at its own length,
evaluation/datasets.py:116).  ``--per-item-lengths`` reproduces the
reference's protocol-exact behaviour by grouping items of equal length.
"""

from __future__ import annotations

import argparse
import json
from collections import OrderedDict, defaultdict


from ..eval.driver import (  # shared protocol driver (also used by eval_base)
    clean_json as _clean,
    generate_batches as _generate_batches,
    interleave as _interleave,
    length_groups as _length_groups,
    run_side,
    summarize_metrics,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate MixerMDM")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--evaluator-checkpoint", type=str, default=None)
    parser.add_argument("--evaluator-individual-checkpoint", type=str, default=None,
                        help="individual-mode InterCLIP (the reference's "
                             "configs/eval_individual.yaml is absent from its repo)")
    parser.add_argument("--data-root", type=str, default="./data")
    parser.add_argument("--hml3d-root", type=str, default="./data/HumanML3D",
                        help="HumanML3D test set for the individual-quality side")
    parser.add_argument("--out", type=str, default="eval_results.json")
    parser.add_argument("--datasets", type=str, default="both",
                        choices=["both", "interhuman", "hml3d"])
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument("--replications", type=int, default=None)
    parser.add_argument("--mm-num-samples", type=int, default=None,
                        help="0 disables MultiModality")
    parser.add_argument("--mm-num-repeats", type=int, default=None)
    parser.add_argument("--per-item-lengths", action="store_true",
                        help="generate each item at its own length "
                             "(protocol-exact; reference datasets.py:116)")
    parser.add_argument("--dualmdm-cross", action="store_true",
                        help="cross-dataset composition comparison: generate "
                             "from InterHuman interaction texts crossed with "
                             "random HumanML3D individual texts, sweeping "
                             "force_influence_val (reference "
                             "evaluation/datasets.py:228-382)")
    parser.add_argument("--force-influence-sweep", type=str, default="none,0",
                        help="comma list of force_influence values for "
                             "--dualmdm-cross ('none' = learned influence)")
    parser.add_argument("--decompose", type=str, default="none",
                        choices=("none", "identity", "heuristic"),
                        help="interaction-text decomposition for the "
                             "InterHuman side (the reference's llm=True "
                             "splitter, evaluation/datasets.py:32-96): "
                             "'heuristic' = offline linguistic clause "
                             "splitter, 'identity' = force both persons to "
                             "the interaction caption, 'none' = use the "
                             "dataset's individual texts (default)")
    parser.add_argument("--sampler", type=str, default=None,
                        choices=("ddim", "dpmpp"),
                        help="override the generation sampler (protocol "
                             "default: the model config's ddim50). "
                             "NON-PROTOCOL — for dryruns/sampler studies; "
                             "results are not comparable to the reference")
    parser.add_argument("--sample-steps", type=int, default=None,
                        help="respace the generation chain to N model "
                             "calls (NON-PROTOCOL, see --sampler)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-data-parallel", action="store_true",
                        help="disable sharding generation over the device mesh")
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from ..config import Config
    from ..data import (
        HumanML3DDataset,
        InterHumanDataset,
        make_hml3d_fixture,
        make_interhuman_fixture,
    )
    from ..eval import (
        EvalProtocol,
        EvaluatorWrapper,
        EvaluatorWrapperIndividual,
        calculate_f_score,
        get_metric_statistics,
    )
    from ..eval.interclip import InterCLIP
    from ..train.checkpoint import restore_checkpoint
    from .infer_mixermdm import build_system

    protocol = EvalProtocol()
    replications = args.replications or protocol.replication_times

    if args.tiny:
        root = "/tmp/eval_synth"
        make_interhuman_fixture(root, n_clips=4, n_frames=40)
        make_hml3d_fixture(root + "/HumanML3D", n_clips=4, n_frames=40)
        args.data_root = root
        args.hml3d_root = root + "/HumanML3D"
        num_samples = 4
        batch_size = 2
        max_frames = 16
        mm_num_samples = 2 if args.mm_num_samples is None else args.mm_num_samples
        mm_num_repeats = 3 if args.mm_num_repeats is None else args.mm_num_repeats
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
        mm_num_samples = protocol.mm_num_samples if args.mm_num_samples is None else args.mm_num_samples
        mm_num_repeats = protocol.mm_num_repeats if args.mm_num_repeats is None else args.mm_num_repeats
        evaluator = InterCLIP()

    system = build_system(args.model, tiny=args.tiny)
    if args.sampler or args.sample_steps:
        from ..systems import apply_sampler_overrides

        apply_sampler_overrides(system, args.sampler, args.sample_steps)
        print(f"NON-PROTOCOL sampler override: "
              f"{system.sampler_type}{system.sample_schedule.num_timesteps}")
    rng = jax.random.PRNGKey(args.seed)
    rng, r1, r2 = jax.random.split(rng, 3)
    params = system.init_params(r1)
    if args.checkpoint:
        params = restore_checkpoint(args.checkpoint, params)
    eval_params = evaluator.init_params(r2)
    if args.evaluator_checkpoint:
        eval_params = restore_checkpoint(args.evaluator_checkpoint, eval_params)

    evaluator_ind = eval_ind_params = None
    if args.datasets in ("both", "hml3d"):
        # Individual-mode InterCLIP (MotionEncoder on single-person 262-d).
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

    # Data-parallel generation over all local devices: params replicated,
    # cond batches sharded on the data axis (each chip samples its slice of
    # the batch independently — generation has no cross-item coupling).
    mesh = None
    if len(jax.devices()) > 1 and not args.no_data_parallel:
        from ..parallel.mesh import make_mesh, replicate

        mesh = make_mesh()
        params = replicate(params, mesh)
        print(f"data-parallel generation over {mesh.devices.size} devices")

    # Scoring shards over the same mesh as generation: the wrapper pads each
    # embedding batch to a device multiple and splits rows over "data".
    wrapper = EvaluatorWrapper(evaluator, eval_params, mesh=mesh)

    side_kw = dict(
        num_samples=num_samples, max_frames=max_frames,
        replications=replications, seed=args.seed,
        per_item=args.per_item_lengths,
        mm_num_samples=mm_num_samples, mm_num_repeats=mm_num_repeats,
        mesh=mesh,
    )

    metrics_ih = metrics_hml = None
    if args.datasets in ("both", "interhuman"):
        print("===== InterHuman (interaction quality) =====")
        dataset = InterHumanDataset(args.data_root, mode="test", max_gt_length=max_frames)
        if len(dataset) == 0:
            raise SystemExit(f"no test data under {args.data_root}")
        decomposer = None
        if args.decompose != "none":
            from ..eval.decompose import get_decomposer

            decomposer = get_decomposer(args.decompose)
        metrics_ih = run_side(
            system, params, dataset, wrapper, protocol,
            individual=False, batch_size=batch_size,
            text_decomposer=decomposer, **side_kw,
        )

    if args.datasets in ("both", "hml3d"):
        print("===== HumanML3D (individual quality) =====")
        # The mixer generates from HumanML3D texts; the individual evaluator
        # judges per-person halves (reference eval/mixermdm.py:330-345).
        hml = HumanML3DDataset(
            args.hml3d_root, mode="test", extended=True, max_gt_length=max_frames
        )
        if len(hml) == 0:
            raise SystemExit(f"no HumanML3D test data under {args.hml3d_root}")
        ind_wrapper = EvaluatorWrapperIndividual(evaluator_ind, eval_ind_params,
                                                 mesh=mesh)
        metrics_hml = run_side(
            system, params, hml, ind_wrapper, protocol,
            individual=True,
            batch_size=protocol.batch_size_hml3d if not args.tiny else batch_size,
            **side_kw,
        )

    def summarize(metrics):
        return summarize_metrics(metrics, replications)

    summary = {}
    if args.dualmdm_cross:
        from ..eval.driver import run_dualmdm_cross

        sweep = [None if v.strip().lower() in ("none", "") else float(v)
                 for v in args.force_influence_sweep.split(",")]
        print("===== DualMDM cross-dataset sweep =====")
        gt_ih = InterHumanDataset(args.data_root, mode="test",
                                  max_gt_length=max_frames)
        hml_texts = HumanML3DDataset(args.hml3d_root, mode="test",
                                     extended=False, max_gt_length=max_frames)
        if len(gt_ih) == 0 or len(hml_texts) == 0:
            raise SystemExit("dualmdm-cross needs both InterHuman and "
                             "HumanML3D test data")
        cross = run_dualmdm_cross(
            system, params, gt_ih, hml_texts, wrapper, protocol,
            sweep=sweep, num_samples=num_samples, batch_size=batch_size,
            max_frames=max_frames, replications=replications,
            seed=args.seed, mesh=mesh,
        )
        summary["dualmdm_cross"] = summarize(cross)
    if metrics_ih is not None:
        summary["interhuman"] = summarize(metrics_ih)
    if metrics_hml is not None:
        summary["hml3d"] = summarize(metrics_hml)
    if metrics_ih is not None and metrics_hml is not None:
        fscores = calculate_f_score(metrics_ih, metrics_hml, replications)
        summary["f_score"] = {
            metric: {name: [float(np.asarray(f).mean()), float(np.asarray(ci).mean())]
                     for name, (f, ci) in d.items()}
            for metric, d in fscores.items()
        }

    summary = _clean(summary)
    print(json.dumps(summary, indent=2))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {args.out}")
    return summary


if __name__ == "__main__":
    main()
