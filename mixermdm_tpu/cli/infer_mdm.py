"""MDM single-person inference CLI.

Reference (``/root/reference/src/scripts/infer/mdm.py:94-137``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_system(model_cfg_path: str | None = None, tiny: bool = False):
    from ..config import get_config, tiny_config
    from ..models.clip_text import ClipTextConfig
    from ..systems import MDMSystem

    if tiny:
        cfg = tiny_config()
        clip_cfg = ClipTextConfig.tiny(width=64)
    else:
        from ..config import MDM_DEFAULT

        cfg = get_config(model_cfg_path) if model_cfg_path else MDM_DEFAULT
        clip_cfg = ClipTextConfig.vit_b_32()
    return MDMSystem(cfg, clip_cfg=clip_cfg)


def main(argv=None):
    parser = argparse.ArgumentParser(description="MDM inference")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--name", type=str, required=True)
    parser.add_argument("--text", type=str, required=True)
    parser.add_argument("--num-samples", type=int, default=1)
    parser.add_argument("--window", type=int, default=196)
    parser.add_argument("--out-dir", type=str, default="results")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--sampler", type=str, default=None,
                        choices=("ddim", "dpmpp"),
                        help="sampling update rule (dpmpp = DPM-Solver++"
                             "(2M), ~DDIM-50 quality at half the steps)")
    parser.add_argument("--sample-steps", type=int, default=None,
                        help="respace the sampling chain to N model calls")
    args = parser.parse_args(argv)

    import jax

    system = build_system(args.model, tiny=args.tiny)
    if args.tiny:
        args.window = 16
    from ..systems import apply_sampler_overrides

    apply_sampler_overrides(system, args.sampler, args.sample_steps)
    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)
    if args.checkpoint:
        from ..train.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.checkpoint, params)

    B = args.num_samples
    cond = system.text_process(params, [args.text] * B)
    out = np.asarray(system.sample(params, cond, args.window, rng))

    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, f"{args.name}_motion.npy"), out)
    print(f"saved {out.shape} to {args.out_dir}/{args.name}_motion.npy")


if __name__ == "__main__":
    main()
