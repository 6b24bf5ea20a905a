"""Fine-tune an interaction model from an individual checkpoint.

Reference (``/root/reference/src/scripts/train/finetuned.py:152-247``):
renames individual->interaction keys, loads non-strict, freezes all
``sa_block`` self-attention params, then trains on InterHuman.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Finetune interaction from individual")
    parser.add_argument("--individual-checkpoint", type=str, default=None,
                        help="orbax checkpoint of the individual system")
    parser.add_argument("--data-root", type=str, default="./data")
    parser.add_argument("--out-dir", type=str, default="./checkpoints/finetuned")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import numpy as np
    import optax

    from ..config import IN2IN_INTERACTION_DEFAULT, tiny_config
    from ..data import DataLoader, InterHumanDataset, make_interhuman_fixture
    from ..models.clip_text import ClipTextConfig
    from ..systems import In2INSystem
    from ..train.checkpoint import restore_checkpoint, save_checkpoint
    from ..train.finetune import individual_to_interaction_params, masked_optimizer
    from ..train.trainer import BaseTrainer
    from ..utils.logging import MetricLogger

    if args.tiny:
        cfg = tiny_config()
        clip_cfg = ClipTextConfig.tiny()
        root = os.path.join(args.out_dir, "_synth")
        make_interhuman_fixture(root, n_clips=3, n_frames=40)
        args.data_root = root
        args.epochs, args.batch_size, max_frames = 1, 2, 32
    else:
        cfg = IN2IN_INTERACTION_DEFAULT
        clip_cfg = ClipTextConfig.vit_l_14()
        max_frames = 300

    # Build BOTH systems: the individual source and the interaction target.
    rng = jax.random.PRNGKey(args.seed)
    rng, r1, r2 = jax.random.split(rng, 3)
    target = In2INSystem(cfg, mode="interaction", clip_cfg=clip_cfg)
    target_params = target.init_params(r1)

    if args.individual_checkpoint:
        src = In2INSystem(cfg, mode="individual", clip_cfg=clip_cfg)
        src_params = restore_checkpoint(args.individual_checkpoint, src.init_params(r2))
        # individual -> interaction transfer (ca_blocks keep fresh init).
        target_params = dict(target_params)
        target_params["denoiser_interaction"] = individual_to_interaction_params(
            src_params["denoiser_individual"], target_params["denoiser_interaction"]
        )

    trainer = BaseTrainer(target, lr=args.lr)
    # Freeze sa_block self-attention during fine-tuning (finetuned.py:218-220).
    trainer.opt = masked_optimizer(
        trainer.opt,
        {k: target_params[k] for k in trainer._trainable_keys(target_params)},
    )
    trainer._jit_step = jax.jit(trainer._step)
    state = trainer.init_state(target_params)

    dataset = InterHumanDataset(args.data_root, mode="train", max_gt_length=max_frames)
    if len(dataset) == 0:
        raise SystemExit(f"no data under {args.data_root}")
    loader = DataLoader(dataset, batch_size=args.batch_size, seed=args.seed)
    logger = MetricLogger(log_every=10)

    step = 0
    for epoch in range(args.epochs):
        for batch in loader:
            toks = target.tokenize_batch(batch)
            dev_batch = {
                "motions": batch["motions"].astype(np.float32),
                "motion_lens": batch["motion_lens"],
                "tokens": np.asarray(toks["tokens"]),
                "tokens_i1": np.asarray(toks["tokens_i1"]),
                "tokens_i2": np.asarray(toks["tokens_i2"]),
            }
            rng, step_rng = jax.random.split(rng)
            state, losses = trainer.step(state, dev_batch, step_rng)
            logger.log(step, epoch, {"total": float(losses["total"])})
            step += 1
            if args.max_steps and step >= args.max_steps:
                break
        if args.max_steps and step >= args.max_steps:
            break

    save_checkpoint(os.path.join(args.out_dir, "final"), state.params)
    print(f"finetune done: {step} steps")


if __name__ == "__main__":
    main()
