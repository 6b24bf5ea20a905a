"""MixerMDM inference CLI — mirrors the reference README entry point.

Reference (``/root/reference/src/scripts/infer/mixermdm.py:146-188``, usage
``README.md:46-56``): three text prompts -> N samples, 299-frame window,
full DDIM chain, saves motion + influence arrays, gaussian-smooths the
output, renders skeleton video + influence plot.

Usage::

    python -m mixermdm_tpu.cli.infer_mixermdm \
        --model configs/models/MixerMDM.yaml \
        --name out --text-interaction "..." --text-individual1 "..." \
        --text-individual2 "..." [--num-samples 10] [--window 299]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_system(model_cfg_path: str | None, align: bool = True, tiny: bool = False):
    import jax  # noqa: F401

    from ..config import (
        IN2IN_INDIVIDUAL_DEFAULT,
        IN2IN_INTERACTION_DEFAULT,
        MIXERMDM_DEFAULT,
        get_config,
    )
    from ..models.clip_text import ClipTextConfig
    from ..systems import In2INSystem, MixerMDMSystem

    if tiny:
        from bench import build_system as bench_build  # reuse tiny wiring

        return bench_build(tiny=True)

    cfg = get_config(model_cfg_path) if model_cfg_path else MIXERMDM_DEFAULT
    clip_cfg = ClipTextConfig.vit_l_14()
    cfg1 = get_config(cfg["MODEL1"]) if "MODEL1" in cfg else IN2IN_INDIVIDUAL_DEFAULT
    cfg2 = get_config(cfg["MODEL2"]) if "MODEL2" in cfg else IN2IN_INTERACTION_DEFAULT
    m1 = In2INSystem(cfg1, mode="individual", clip_cfg=clip_cfg)
    m2 = In2INSystem(cfg2, mode="interaction", clip_cfg=clip_cfg)
    return MixerMDMSystem(cfg, model1=m1, model2=m2, clip_cfg=clip_cfg, align=align)


def gaussian_smooth(motion: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Temporal gaussian filter over frames (infer/mixermdm.py:132)."""
    from scipy.ndimage import gaussian_filter1d

    return gaussian_filter1d(motion, sigma=sigma, axis=-2)


def main(argv=None):
    parser = argparse.ArgumentParser(description="MixerMDM inference")
    parser.add_argument("--model", type=str, default=None, help="model config yaml")
    parser.add_argument("--name", type=str, required=True, help="output name")
    parser.add_argument("--text-interaction", type=str, required=True)
    # The reference CLI requires all three prompts; when the individual
    # prompts are omitted here they are derived from the interaction text by
    # the offline linguistic decomposer (eval/decompose.py — the same job
    # the reference delegates to gpt-4o-mini in its eval pipeline).
    parser.add_argument("--text-individual1", type=str, default=None)
    parser.add_argument("--text-individual2", type=str, default=None)
    parser.add_argument("--num-samples", type=int, default=10)
    parser.add_argument("--window", type=int, default=299)
    parser.add_argument("--out-dir", type=str, default="results")
    parser.add_argument("--checkpoint", type=str, default=None, help="orbax checkpoint dir")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-align", action="store_true")
    parser.add_argument("--tiny", action="store_true", help="tiny config smoke run")
    parser.add_argument("--no-smooth", action="store_true")
    parser.add_argument("--traj-control", type=str, default=None, metavar="NPY",
                        help="motion .npy whose root trajectory (dims 0/2 and "
                             "262/264) is pinned every denoising step "
                             "(reference x_start control)")
    parser.add_argument("--warm-start", type=str, default=None, metavar="NPY",
                        help="motion .npy to q-sample as the chain's starting "
                             "point (reference init_image)")
    parser.add_argument("--skip-timesteps", type=int, default=0,
                        help="drop the first N (respaced) denoising steps; "
                             "with no --warm-start a zero motion is used")
    parser.add_argument("--sampler", type=str, default=None,
                        choices=("ddim", "dpmpp"),
                        help="sampling update rule: ddim (reference "
                             "behaviour, config default) or dpmpp "
                             "(DPM-Solver++(2M): ~DDIM-50 quality at half "
                             "the steps — pair with --sample-steps 25)")
    parser.add_argument("--sample-steps", type=int, default=None,
                        help="respace the sampling chain to N model calls "
                             "(overrides the config STRATEGY)")
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
    parser.add_argument("--pp", type=int, default=1,
                        help="pipeline-parallel degree: the in2IN denoiser "
                             "layer stacks run as a GPipe pipeline over a "
                             "'pipe' mesh axis of N devices (microbatched "
                             "person-stacked batch, ppermute hand-off); "
                             "mutually exclusive with --tp")
    args = parser.parse_args(argv)

    if args.sp and args.tp <= 1:
        raise SystemExit("--sp requires --tp > 1 (it shards over the model axis)")
    if args.pp > 1 and args.tp > 1:
        raise SystemExit("--pp and --tp are mutually exclusive (compose via "
                         "the library's pipeline_scope over a 2-D mesh)")
    if args.tp > 1:
        from ..models.layers import set_xla_only

        set_xla_only(True)

    import jax

    system = build_system(args.model, align=not args.no_align, tiny=args.tiny)
    from ..systems import apply_sampler_overrides

    apply_sampler_overrides(system, args.sampler, args.sample_steps)
    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)
    if args.checkpoint:
        from ..train.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.checkpoint, params)

    B = args.num_samples
    window = args.window if not args.tiny else 16
    t1, t2 = args.text_individual1, args.text_individual2
    if t1 is None or t2 is None:
        from ..eval.decompose import decompose_interaction_text

        d1, d2 = decompose_interaction_text(args.text_interaction)
        t1 = d1 if t1 is None else t1
        t2 = d2 if t2 is None else t2
        print(f"decomposed individual prompts:\n  1: {t1}\n  2: {t2}")
    batch = {
        "text_interaction": [args.text_interaction] * B,
        "text_individual1": [t1] * B,
        "text_individual2": [t2] * B,
        "motion_lens": np.asarray([window] * B),
    }

    def _load_control(path, window):
        """Raw (T, 524) or (B, T, 524) motion .npy -> model-2 (InterHuman)
        normalised space, padded/cropped to the window.  The chain pins /
        warm-starts BOTH streams with the same values, matching the
        reference's shared x_start pinning (gaussian_diffusion.py:1874-1882).
        """
        if path is None:
            return None
        import jax.numpy as jnp

        m = np.load(path).astype(np.float32)
        if m.ndim == 2:
            m = m[None]
        m = np.broadcast_to(m, (B,) + m.shape[1:]).copy()
        if m.shape[1] < window:  # pad/crop to the sampling window
            pad = np.zeros((B, window - m.shape[1], m.shape[2]), np.float32)
            m = np.concatenate([m, pad], axis=1)
        m = m[:, :window]
        normed = system.normalizer2.forward(
            jnp.asarray(m.reshape(B, window, 2, -1))
        )
        return np.asarray(normed).reshape(B, window, -1)

    sample_kwargs = {}
    traj = _load_control(args.traj_control, window)
    warm = _load_control(args.warm_start, window)
    if traj is not None:
        sample_kwargs["traj_control"] = traj
    if warm is not None:
        sample_kwargs["init_image"] = warm
    if args.skip_timesteps:
        sample_kwargs["skip_timesteps"] = args.skip_timesteps

    if args.pp > 1:
        # Pipeline-parallel generation: the denoiser stacks run as a GPipe
        # schedule over the first N devices; everything else is replicated.
        from ..parallel.mesh import make_mesh
        from ..parallel.pipeline import pipeline_scope

        n_avail = len(jax.devices())
        if args.pp > n_avail:
            raise SystemExit(f"--pp {args.pp} > {n_avail} available devices")
        mesh = make_mesh(args.pp, axis="pipe")
        cond = system.generate_cond(params, batch)
        with pipeline_scope(mesh):
            sampled, infl = system.sample(params, cond, window, rng,
                                          collect_influence=True,
                                          **sample_kwargs)
        out = {"output": sampled, "influence_i1": infl[0],
               "influence_i2": infl[1]}
    elif args.tp > 1:
        # dp x tp generation: params Megatron-sharded over the model axis,
        # the sample batch over the data axis.
        from ..parallel.mesh import data_sharded, make_mesh_2d, tp_shard_params

        n_avail = len(jax.devices())
        if n_avail % args.tp:
            raise SystemExit(f"--tp {args.tp} does not divide {n_avail} devices")
        n_data = max(d for d in range(1, n_avail // args.tp + 1) if B % d == 0)
        mesh = make_mesh_2d(n_data, args.tp)
        if args.sp:
            from ..models.layers import set_sequence_parallel

            set_sequence_parallel(mesh)
        params = tp_shard_params(params, mesh)
        cond = jax.device_put(system.generate_cond(params, batch),
                              data_sharded(mesh))
        from ..utils.alignment import geometry_batch_scope

        with geometry_batch_scope(mesh):
            sampled, infl = system.sample(params, cond, window, rng,
                                          collect_influence=True,
                                          **sample_kwargs)
        out = {"output": sampled, "influence_i1": infl[0],
               "influence_i2": infl[1]}
    elif len(jax.devices()) > 1 and B % len(jax.devices()) == 0:
        # Data-parallel generation: params replicated, the per-prompt sample
        # batch sharded over the device mesh (samples are independent).
        from ..parallel.mesh import data_sharded, make_mesh, replicate

        mesh = make_mesh()
        params = replicate(params, mesh)
        cond = jax.device_put(system.generate_cond(params, batch),
                              data_sharded(mesh))
        sampled, infl = system.sample(params, cond, window, rng,
                                      collect_influence=True, **sample_kwargs)
        out = {"output": sampled, "influence_i1": infl[0],
               "influence_i2": infl[1]}
    else:
        cond = system.generate_cond(params, batch)
        sampled, infl = system.sample(params, cond, window, rng,
                                      collect_influence=True, **sample_kwargs)
        out = {"output": sampled, "influence_i1": infl[0],
               "influence_i2": infl[1]}
    motions = np.asarray(out["output"])
    if not args.no_smooth:
        motions = gaussian_smooth(motions)

    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, f"{args.name}_motion.npy"), motions)
    np.save(os.path.join(args.out_dir, f"{args.name}_influence_i1.npy"),
            np.asarray(out["influence_i1"]))
    np.save(os.path.join(args.out_dir, f"{args.name}_influence_i2.npy"),
            np.asarray(out["influence_i2"]))
    print(f"saved {B} samples of shape {motions.shape[1:]} to {args.out_dir}/")

    try:
        from ..utils.plot import plot_3d_motion

        plot_3d_motion(
            os.path.join(args.out_dir, f"{args.name}_sample0.mp4"),
            motions[0], title=args.text_interaction,
        )
    except Exception as e:  # rendering is best-effort (no display/ffmpeg)
        print(f"(skipped video render: {e})")

    try:
        from ..utils.plot import plot_influence

        mode = int(system.cfg.MIXING_MODE)
        pdf = plot_influence(
            os.path.join(args.out_dir, args.name),
            np.asarray(out["influence_i1"]), mixing_mode=mode,
            influence2=np.asarray(out["influence_i2"]),
        )
        print(f"influence plot: {pdf}")
    except Exception as e:
        print(f"(skipped influence plot: {e})")


if __name__ == "__main__":
    main()
