"""in2IN / DualMDM inference CLI.

Reference (``/root/reference/src/scripts/infer/in2IN.py:111-154``): modes
``interaction`` / ``individual`` / ``dual`` (DualMDM baseline), 210-frame
window, per-mode normalizer backward + gaussian smoothing.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_system(model_cfg_path: str | None = None, mode: str = "interaction",
                 tiny: bool = False, w_func: str = "const", w_value: float = 0.5):
    from ..config import (
        IN2IN_INDIVIDUAL_DEFAULT,
        IN2IN_INTERACTION_DEFAULT,
        get_config,
        tiny_config,
    )
    from ..models.clip_text import ClipTextConfig
    from ..systems import In2INSystem

    if tiny:
        cfg = tiny_config()
        clip_cfg = ClipTextConfig.tiny()
    else:
        default = (
            IN2IN_INDIVIDUAL_DEFAULT if mode == "individual" else IN2IN_INTERACTION_DEFAULT
        )
        cfg = get_config(model_cfg_path) if model_cfg_path else default
        clip_cfg = ClipTextConfig.vit_l_14()
    if mode == "dual":
        from ..config import Config

        cfg = dict(cfg)
        cfg["W_FUNC"] = w_func
        cfg["W_VALUE"] = w_value
        cfg = Config.wrap(cfg)
    return In2INSystem(cfg, mode=mode, clip_cfg=clip_cfg)


def main(argv=None):
    parser = argparse.ArgumentParser(description="in2IN inference")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--name", type=str, required=True)
    parser.add_argument("--mode", type=str, default="interaction",
                        choices=["interaction", "individual", "dual"])
    parser.add_argument("--text", type=str, required=True)
    parser.add_argument("--text-individual1", type=str, default=None)
    parser.add_argument("--text-individual2", type=str, default=None)
    parser.add_argument("--num-samples", type=int, default=1)
    parser.add_argument("--window", type=int, default=210)
    parser.add_argument("--out-dir", type=str, default="results")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--w-func", type=str, default="const", help="DualMDM weight schedule")
    parser.add_argument("--w-value", type=float, default=0.5)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--traj-control", type=str, default=None, metavar="NPY",
                        help="raw motion .npy whose root trajectory is pinned "
                             "every step (reference x_start control)")
    parser.add_argument("--warm-start", type=str, default=None, metavar="NPY",
                        help="raw motion .npy to q-sample as the chain start "
                             "(reference init_image)")
    parser.add_argument("--skip-timesteps", type=int, default=0)
    parser.add_argument("--sampler", type=str, default=None,
                        choices=("ddim", "dpmpp"),
                        help="sampling update rule (dpmpp = DPM-Solver++"
                             "(2M), ~DDIM-50 quality at half the steps)")
    parser.add_argument("--sample-steps", type=int, default=None,
                        help="respace the sampling chain to N model calls")
    parser.add_argument("--pp", type=int, default=1,
                        help="pipeline-parallel degree: the denoiser layer "
                             "stacks run as a GPipe pipeline over a 'pipe' "
                             "mesh axis of N devices")
    args = parser.parse_args(argv)

    import jax

    system = build_system(args.model, mode=args.mode, tiny=args.tiny,
                          w_func=args.w_func, w_value=args.w_value)
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
    batch = {"text": [args.text] * B, "motion_lens": np.asarray([args.window] * B)}
    if args.mode != "individual":
        batch["text_individual1"] = [args.text_individual1 or args.text] * B
        batch["text_individual2"] = [args.text_individual2 or args.text] * B

    def _load_control(path):
        """Raw motion .npy -> this mode's normalised sampling space,
        broadcast to B and padded/cropped to the window."""
        if path is None:
            return None
        import jax.numpy as jnp

        m = np.load(path).astype(np.float32)
        if m.ndim == 2:
            m = m[None]
        m = np.broadcast_to(m, (B,) + m.shape[1:]).copy()
        if m.shape[1] < args.window:
            pad = np.zeros((B, args.window - m.shape[1], m.shape[2]), np.float32)
            m = np.concatenate([m, pad], axis=1)
        m = m[:, : args.window]
        P = 2 if args.mode != "individual" else 1
        normed = system.normalizer.forward(
            jnp.asarray(m.reshape(B, args.window, P, -1))
        )
        return np.asarray(normed).reshape(B, args.window, -1)

    sample_kwargs = {}
    if args.traj_control:
        sample_kwargs["traj_control"] = _load_control(args.traj_control)
    if args.warm_start:
        sample_kwargs["init_image"] = _load_control(args.warm_start)
    if args.skip_timesteps:
        sample_kwargs["skip_timesteps"] = args.skip_timesteps

    cond = system.build_cond(params, batch)
    if args.pp > 1:
        from ..parallel.mesh import make_mesh
        from ..parallel.pipeline import pipeline_scope

        if args.pp > len(jax.devices()):
            raise SystemExit(f"--pp {args.pp} > {len(jax.devices())} available devices")
        with pipeline_scope(make_mesh(args.pp, axis="pipe")):
            out = np.asarray(
                system.sample(params, cond, args.window, rng, **sample_kwargs)
            )
    else:
        out = np.asarray(system.sample(params, cond, args.window, rng, **sample_kwargs))

    from scipy.ndimage import gaussian_filter1d

    out = gaussian_filter1d(out, sigma=1.0, axis=-2)
    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, f"{args.name}_motion.npy"), out)
    print(f"saved {out.shape} to {args.out_dir}/{args.name}_motion.npy")


if __name__ == "__main__":
    main()
