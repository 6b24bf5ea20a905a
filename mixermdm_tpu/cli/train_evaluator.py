"""InterCLIP evaluator training CLI.

Reference (``/root/reference/src/scripts/train/evaluator.py:138-182``; note
the reference script is broken — it imports a nonexistent
``DataModuleIndividual``, SURVEY.md §4).  Trains the contrastive
motion<->text extractor used for FID / R-precision.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train InterCLIP evaluator")
    parser.add_argument("--data-root", type=str, default="./data")
    parser.add_argument("--out-dir", type=str, default="./checkpoints/evaluator")
    parser.add_argument("--mode", type=str, default="interaction",
                        choices=["interaction", "individual"])
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight-decay", type=float, default=2e-5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import numpy as np
    import optax

    from ..config import Config
    from ..data import DataLoader, InterHumanDataset, make_interhuman_fixture
    from ..eval.interclip import InterCLIP
    from ..models.clip_text import tokenize
    from ..train.checkpoint import save_checkpoint
    from ..utils.logging import MetricLogger

    if args.tiny:
        root = os.path.join(args.out_dir, "_synth")
        make_interhuman_fixture(root, n_clips=3, n_frames=40)
        args.data_root = root
        args.epochs, args.batch_size, max_frames = 1, 2, 32
        cfg = Config.wrap(
            {"INPUT_DIM": 258, "LATENT_DIM": 32, "FF_SIZE": 64, "NUM_LAYERS": 1,
             "NUM_HEADS": 2, "DROPOUT": 0.0, "MODE": args.mode}
        )
        model = InterCLIP(cfg, text_width=64)
        from ..models.torch_compat import TorchEncoder

        model.text_encoder = TorchEncoder(64, 2, 64, 1)
    else:
        cfg = Config.wrap(
            {"INPUT_DIM": 258, "LATENT_DIM": 1024, "FF_SIZE": 2048, "NUM_LAYERS": 8,
             "NUM_HEADS": 8, "DROPOUT": 0.1, "MODE": args.mode}
        )
        model = InterCLIP(cfg)
        max_frames = 300

    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    params = jax.jit(model.init_params)(init_rng)

    opt = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, motions, lens, tokens):
        def loss_fn(p):
            loss, losses = model.compute_loss(p, motions, lens, tokens)
            return loss, losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses

    dataset = InterHumanDataset(args.data_root, mode="train", max_gt_length=max_frames)
    if len(dataset) == 0:
        raise SystemExit(f"no data under {args.data_root}")
    loader = DataLoader(dataset, batch_size=args.batch_size, seed=args.seed)
    logger = MetricLogger(log_every=10)

    step = 0
    for epoch in range(args.epochs):
        for batch in loader:
            tokens = np.asarray(tokenize(batch["text"], model.tokenizer))
            params, opt_state, losses = train_step(
                params, opt_state,
                batch["motions"].astype(np.float32), batch["motion_lens"], tokens,
            )
            logger.log(step, epoch, {"total": float(losses["total"])})
            step += 1
            if args.max_steps and step >= args.max_steps:
                break
        if args.max_steps and step >= args.max_steps:
            break

    save_checkpoint(os.path.join(args.out_dir, "final"), params)
    print(f"evaluator training done: {step} steps")


if __name__ == "__main__":
    main()
