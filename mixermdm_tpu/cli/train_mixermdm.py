"""Adversarial MixerMDM training CLI.

Reference (``/root/reference/src/scripts/train/mixermdm.py:286-343``):
Lightning harness with two AdamW optimizers, G step per batch + D step every
``DISCRIMINATOR_STEPS``, grad-accum, 0.5 clipping, DDP/NCCL, wandb logging,
epoch checkpoints.  Here: jitted train steps over a data mesh, metric
logging via :mod:`mixermdm_tpu.utils.logging`, orbax checkpoints.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train MixerMDM (adversarial)")
    parser.add_argument("--model", type=str, default=None, help="model config yaml")
    parser.add_argument("--train", type=str, default=None, help="train config yaml")
    parser.add_argument("--data-root", type=str, default="./data")
    parser.add_argument("--out-dir", type=str, default="./checkpoints/mixermdm")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--tiny", action="store_true", help="tiny synthetic smoke run")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--save-every", type=int, default=None, metavar="E",
                        help="checkpoint cadence in epochs (overrides the "
                             "config's TRAIN.SAVE_EPOCH)")
    parser.add_argument("--log-jsonl", type=str, default=None,
                        help="append one JSON record per step (losses, "
                             "influence mean, step wall-time, host RSS) — "
                             "the endurance-run curve artifact")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree: shard attention/FFN "
                             "params over a 'model' mesh axis (Megatron), "
                             "remaining devices form the data axis; forces "
                             "the GSPMD-partitionable XLA-only compute path")
    parser.add_argument("--sp", action="store_true",
                        help="sequence parallelism on top of --tp: the "
                             "residual stream shards over the model axis "
                             "along T between sub-layers (Megatron-SP, "
                             "GSPMD formulation)")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3: shard params + optimizer state over "
                             "the data axis (all-gather at use, "
                             "reduce-scatter grads); composes with --tp")
    parser.add_argument("--nan-guard", type=int, default=0, metavar="N",
                        help="failure detection: skip G/D updates with "
                             "non-finite gradients in-graph instead of "
                             "poisoning the params; error out after N "
                             "CONSECUTIVE bad steps (0 = off)")
    parser.add_argument("--quant-train", action="store_true",
                        help="W8A8 the frozen denoiser forwards inside the "
                             "training loss (QUANT_TRAIN; the generator then "
                             "trains against int8 frozen outputs — measured "
                             "step-time win in BASELINE.md, quality gate "
                             "in scripts/quant_ab.py --train-arm)")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from ..config import MIXERMDM_TRAIN_DEFAULT, get_config
    from ..data import DataLoader, InterHumanDataset, make_interhuman_fixture
    from ..parallel.mesh import make_data_mesh_for_batch, replicate, shard_batch
    from ..train.checkpoint import restore_checkpoint, save_checkpoint
    from ..train.trainer import MixerTrainer
    from ..utils.logging import MetricLogger
    from .infer_mixermdm import build_system

    tcfg = get_config(args.train) if args.train else MIXERMDM_TRAIN_DEFAULT
    tr = tcfg.TRAIN
    epochs = args.epochs or int(tr.EPOCH)
    batch_size = args.batch_size or int(tr.BATCH_SIZE)

    if args.tiny:
        root = os.path.join(args.out_dir, "_synth")
        make_interhuman_fixture(root, n_clips=3, n_frames=40)
        args.data_root = root
        epochs = 1
        batch_size = 2
        max_frames = 32
    else:
        max_frames = 300

    system = build_system(args.model, tiny=args.tiny)
    if args.quant_train:
        system.quant_train = True
    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)

    if args.tp > 1:
        # dp x tp: the Pallas/int8 kernels are single-chip programs, so the
        # whole trace must stay XLA for GSPMD to partition it.
        from ..models.layers import set_xla_only
        from ..parallel.mesh import make_mesh_2d

        set_xla_only(True)
        n_avail = len(jax.devices())
        if n_avail % args.tp:
            raise SystemExit(f"--tp {args.tp} does not divide {n_avail} devices")
        n_data = max(d for d in range(1, n_avail // args.tp + 1)
                     if batch_size % d == 0)
        mesh = make_mesh_2d(n_data, args.tp)
        if args.sp:
            from ..models.layers import set_sequence_parallel

            set_sequence_parallel(mesh)
    else:
        if args.sp:
            raise SystemExit("--sp requires --tp > 1 (it shards over the model axis)")
        mesh = make_data_mesh_for_batch(batch_size)
    trainer = MixerTrainer(
        system,
        lr=float(tr.LR),
        weight_decay=float(tr.WEIGHT_DECAY),
        grad_acc_steps=int(tr.GRAD_ACC_STEPS),
        discriminator_steps=int(tr.DISCRIMINATOR_STEPS),
        i_loss_factor=float(tr.INDIVIDUAL_LOSS_FACTOR),
        I_loss_factor=float(tr.INTERACTION_LOSS_FACTOR),
        l1=float(tr.LOSS_L1),
        mesh=mesh,
        donate=True,   # production loop threads the state; in-place updates
        nan_guard=args.nan_guard,
    )
    state = trainer.init_state(params)
    if args.resume == "auto":
        # Pick the newest *_state checkpoint in the output dir (elastic
        # restart: crashed/preempted jobs relaunch with the same command).
        from ..train.checkpoint import latest_train_state_path

        args.resume = latest_train_state_path(args.out_dir)
        print(f"--resume auto -> {args.resume}")
    if args.resume:
        # Full train-state resume (params + BOTH optimizer states + step),
        # matching the reference's Lightning ckpt_path restore
        # (scripts/train/mixermdm.py:340-343).  Falls back to params-only
        # for plain param checkpoints.
        from ..train.checkpoint import restore_train_state

        try:
            state = restore_train_state(args.resume, state)
        except Exception:
            state = state._replace(
                params=restore_checkpoint(args.resume, state.params)
            )
    if args.fsdp:
        # ZeRO-3: the whole train state (params + Adam moments) splits over
        # the data axis; composes with --tp (TP within, FSDP across).
        from ..parallel.mesh import fsdp_shard_params

        state = fsdp_shard_params(state, mesh)
    elif args.tp > 1:
        # Shard the WHOLE train state: the name-driven TP rule keys on the
        # trailing (parent, leaf) path names, so the Adam moments (mu/nu
        # mirror the param tree) land in the same layout as their params;
        # scalars and non-matching leaves replicate.
        from ..parallel.mesh import tp_shard_params

        state = tp_shard_params(state, mesh)
    else:
        state = state._replace(params=replicate(state.params, mesh))

    dataset = InterHumanDataset(args.data_root, mode="train", max_gt_length=max_frames)
    if len(dataset) == 0:
        raise SystemExit(f"no data found under {args.data_root}")
    # reseed_dataset: augmentation draws become a pure function of
    # (seed, epoch) so --resume auto replays the data stream bitwise.
    loader = DataLoader(dataset, batch_size=batch_size, seed=args.seed,
                        reseed_dataset=True)
    logger = MetricLogger(log_every=int(tr.LOG_STEPS))

    from ..train.checkpoint import save_train_state

    step = int(state.step)
    # Fast-forward the epoch counter on resume (ADVICE r2 medium): a restored
    # state carries the global step, and restarting at epoch 0 would both
    # overtrain past the configured total and re-save epoch_{1..N}_state with
    # restarted numbering (making --resume auto later pick a stale file).
    start_epoch = min(step // max(1, len(loader)), epochs)
    if start_epoch:
        print(f"resume: step {step} -> starting at epoch {start_epoch}/{epochs}")
        loader.set_epoch(start_epoch)

    save_epoch = args.save_every or int(tr.SAVE_EPOCH)
    jsonl = open(args.log_jsonl, "a", buffering=1) if args.log_jsonl else None

    def _rss_mb() -> float:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) / 1024.0
        except OSError:
            pass
        return -1.0

    import json
    import time

    t_prev = time.perf_counter()
    for epoch in range(start_epoch, epochs):
        for batch_idx, batch in enumerate(loader):
            toks = system.tokenize_batch(batch)
            dev_batch = shard_batch(
                {
                    "motions": batch["motions"].astype(np.float32),
                    "motion_lens": batch["motion_lens"],
                    "tokens_inter": np.asarray(toks["tokens_inter"]),
                    "tokens_i1": np.asarray(toks["tokens_i1"]),
                    "tokens_i2": np.asarray(toks["tokens_i2"]),
                },
                mesh,
            )
            # Per-step rng from (seed, step): resume continues the sequence.
            step_rng = jax.random.fold_in(rng, step)
            state, g_losses, d_losses = trainer.fit_step(state, dev_batch, step_rng, batch_idx)
            # ONE device_get for every logged scalar: each separate float()
            # is a device round-trip, and over the tunneled chip those RTTs
            # dominate per-step host time at production size.
            fetched = jax.device_get({
                "g_total": g_losses["total"],
                "g_i1": g_losses.get("generator_i1"),
                "g_I": g_losses.get("generator_I"),
                "influence_mean": g_losses.get("influence_mean"),
                **({"d_total": d_losses["total"]} if d_losses else {}),
            })
            logger.log(step, epoch, {
                "g_total": float(fetched["g_total"]),
                **({"d_total": float(fetched["d_total"])} if d_losses else {}),
            })
            if jsonl is not None:
                t_now = time.perf_counter()
                jsonl.write(json.dumps({
                    "step": step, "epoch": epoch, "batch": batch_idx,
                    "g_total": float(fetched["g_total"]),
                    "g_i1": float(fetched["g_i1"]),
                    "g_I": float(fetched["g_I"]),
                    "influence_mean": float(fetched["influence_mean"]),
                    "d_total": (float(fetched["d_total"]) if d_losses else None),
                    "dt_s": round(t_now - t_prev, 4),
                    "rss_mb": round(_rss_mb(), 1),
                }) + "\n")
                t_prev = t_now
            step += 1
            if args.max_steps and step >= args.max_steps:
                break
        if args.max_steps and step >= args.max_steps:
            break
        if (epoch + 1) % save_epoch == 0 or epoch == epochs - 1:
            save_checkpoint(os.path.join(args.out_dir, f"epoch_{epoch+1}"), state.params)
            save_train_state(os.path.join(args.out_dir, f"epoch_{epoch+1}_state"), state)

    save_checkpoint(os.path.join(args.out_dir, "final"), state.params)
    save_train_state(os.path.join(args.out_dir, "final_state"), state)
    print(f"training done: {step} steps, checkpoints in {args.out_dir}")


if __name__ == "__main__":
    main()
