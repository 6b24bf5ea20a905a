"""Base-model training CLI: in2IN interaction / individual (and MDM).

Reference (``/root/reference/src/scripts/train/in2IN.py:151-201`` /
``mdm.py:128-175``): single AdamW (+ cosine warmup in interaction mode),
MSE + geometric losses, DDP.  Here: one jitted step over the data mesh.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train in2IN / MDM base models")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--mode", type=str, default="interaction",
                        choices=["interaction", "individual", "mdm"])
    parser.add_argument("--data-root", type=str, default="./data")
    parser.add_argument("--out-dir", type=str, default="./checkpoints/base")
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight-decay", type=float, default=2e-5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", type=str, default=None,
                        help='path to a *_state checkpoint, or "auto" for '
                             "the newest one in --out-dir")
    parser.add_argument("--save-epoch", type=int, default=100,
                        help="save params + full train state every N epochs "
                             "(reference SAVE_EPOCH, configs/train)")
    parser.add_argument("--nan-guard", type=int, default=0, metavar="N",
                        help="failure detection: skip updates with "
                             "non-finite gradients; error after N "
                             "consecutive bad steps (0 = off)")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from ..config import (
        IN2IN_INDIVIDUAL_DEFAULT,
        IN2IN_INTERACTION_DEFAULT,
        get_config,
        tiny_config,
    )
    from ..data import (
        DataLoader,
        HumanML3DDataset,
        InterHumanDataset,
        make_hml3d_fixture,
        make_interhuman_fixture,
    )
    from ..models.clip_text import ClipTextConfig
    from ..parallel.mesh import make_data_mesh_for_batch, replicate, shard_batch
    from ..systems import In2INSystem, MDMSystem
    from ..train.checkpoint import restore_checkpoint, save_checkpoint
    from ..train.trainer import BaseTrainer
    from ..utils.logging import MetricLogger

    interaction = args.mode == "interaction"
    if args.tiny:
        cfg = tiny_config()
        clip_cfg = ClipTextConfig.tiny()
        root = os.path.join(args.out_dir, "_synth")
        if interaction:
            make_interhuman_fixture(root, n_clips=3, n_frames=40)
        else:
            make_hml3d_fixture(root, n_clips=3, n_frames=40)
        args.data_root = root
        args.epochs, args.batch_size, max_frames = 1, 2, 32
    else:
        default = IN2IN_INTERACTION_DEFAULT if interaction else IN2IN_INDIVIDUAL_DEFAULT
        cfg = get_config(args.model) if args.model else default
        clip_cfg = ClipTextConfig.vit_l_14() if args.mode != "mdm" else ClipTextConfig.vit_b_32()
        max_frames = 300

    if args.mode == "mdm":
        system = MDMSystem(cfg, clip_cfg=clip_cfg)
    else:
        system = In2INSystem(cfg, mode=args.mode, clip_cfg=clip_cfg)

    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)

    if interaction:
        dataset = InterHumanDataset(args.data_root, mode="train", max_gt_length=max_frames)
    else:
        dataset = HumanML3DDataset(args.data_root, mode="train", max_gt_length=max_frames)
    if len(dataset) == 0:
        raise SystemExit(f"no data found under {args.data_root}")

    loader = DataLoader(dataset, batch_size=args.batch_size, seed=args.seed)

    # Interaction training uses the reference's CosineWarmupScheduler
    # (scripts/train/in2IN.py:51-58: warmup=10 epochs over EPOCH total);
    # scaled per-step here (the reference steps it per epoch).
    lr_schedule = None
    if interaction:
        from ..train.optim import cosine_warmup_schedule

        steps_per_epoch = max(1, len(dataset) // args.batch_size)
        lr_schedule = cosine_warmup_schedule(
            args.lr, 10 * steps_per_epoch, args.epochs * steps_per_epoch
        )

    mesh = make_data_mesh_for_batch(args.batch_size)
    trainer = BaseTrainer(system, lr=args.lr, weight_decay=args.weight_decay,
                          mesh=mesh, lr_schedule=lr_schedule, donate=True,
                          nan_guard=args.nan_guard)
    state = trainer.init_state(params)
    if args.resume == "auto":
        from ..train.checkpoint import latest_train_state_path

        args.resume = latest_train_state_path(args.out_dir)
        print(f"--resume auto -> {args.resume}")
    if args.resume:
        from ..train.checkpoint import restore_train_state

        state = restore_train_state(args.resume, state)
    state = state._replace(params=replicate(state.params, mesh))
    logger = MetricLogger(log_every=10)

    step = int(state.step)
    # Fast-forward the epoch counter on resume (ADVICE r2 medium) — see
    # cli/train_mixermdm.py for the failure mode this prevents.
    start_epoch = min(step // max(1, len(loader)), args.epochs)
    if start_epoch:
        print(f"resume: step {step} -> starting at epoch {start_epoch}/{args.epochs}")
    for epoch in range(start_epoch, args.epochs):
        for batch in loader:
            tokens = {"tokens": np.asarray(system.text.tokenize(batch["text"]))} \
                if hasattr(system, "text") else {}
            if interaction:
                tokens["tokens_i1"] = np.asarray(system.text.tokenize(batch["text_individual1"]))
                tokens["tokens_i2"] = np.asarray(system.text.tokenize(batch["text_individual2"]))
            if args.mode == "mdm":
                from ..models.clip_text import tokenize

                tokens = {"tokens": np.asarray(
                    tokenize(batch["text"], system.tokenizer, context_length=22, pad_to=77)
                )}
            dev_batch = shard_batch(
                {"motions": batch["motions"].astype(np.float32),
                 "motion_lens": batch["motion_lens"], **tokens},
                mesh,
            )
            # Per-step rng derived from (seed, step): resumed runs continue
            # the exact rng sequence of an unbroken one.
            step_rng = jax.random.fold_in(rng, step)
            state, losses = trainer.step(state, dev_batch, step_rng)
            logger.log(step, epoch, {"total": float(losses["total"])})
            step += 1
            if args.max_steps and step >= args.max_steps:
                break
        if (epoch + 1) % args.save_epoch == 0:
            from ..train.checkpoint import save_train_state as _sts

            save_checkpoint(os.path.join(args.out_dir, f"epoch_{epoch+1}"),
                            state.params)
            _sts(os.path.join(args.out_dir, f"epoch_{epoch+1}_state"), state)
        if args.max_steps and step >= args.max_steps:
            break

    from ..train.checkpoint import save_train_state

    save_checkpoint(os.path.join(args.out_dir, "final"), state.params)
    save_train_state(os.path.join(args.out_dir, "final_state"), state)
    print(f"training done: {step} steps")


if __name__ == "__main__":
    main()
