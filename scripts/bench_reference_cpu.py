"""Same-host CPU A/B: the LIVE torch reference DDIM chain vs ours.

VERDICT r3 weak #4: ``bench.py``'s ``vs_baseline`` divides by an *estimate*
of the reference on a GPU (no reference hardware exists in this
environment).  This script adds the one ratio that CAN be measured here:
both frameworks' hot loop on the SAME host CPU, at full production size
and identical weights.

Torch side: the reference's own ``MixerDiffusion.ddim_sample_loop``
(``/root/reference/src/models/utils/gaussian_diffusion.py:1769-1965``)
driving the reference ``Mixer`` (``mixermdm.py:604-810``) wrapped in
``ClassifierFreeSampleModelX2`` (``cfg_sampler.py:31``) — imported live via
``tests/reference_compat`` exactly as the parity suite does, with random
weights perturbed off zero-init (throughput does not depend on weight
values).  Ours: the SAME weights converted through ``train/checkpoint.py``
driving ``ddim_sample_loop_x2`` (one ``lax.scan``) jitted on the XLA CPU
backend, f32 compute (matching torch eager f32 — no bf16/int8/Pallas, so
the ratio isolates the framework design, not TPU-only kernels).

Both sides see the same thread pool, the same allocator pressure, the same
sandbox.  Weights are identical, so the script also reports the final
rel-L2 between the two chains as a full-size sanity check (informational:
CFG-3.5 chains amplify f32 round-off pointwise).

The measured quantity is steady-state seconds PER DDIM STEP at B=10/T=299
(cost is linear in steps; a short ``--steps`` chain keeps torch-eager
runtime tractable), projected to the DDIM-50 workload of ``bench.py``.

Run it ALONE (no concurrent test suite — see ROUND4.md handoff notes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

# Force the XLA CPU backend.  Env pins alone are TOO LATE here: the
# sandbox's sitecustomize.py registers the tunneled TPU plugin (axon) and
# fully imports jax at interpreter startup, before this module runs, with
# JAX_PLATFORMS=axon from the environment.  The only reliable override
# after that is jax.config (same as tests/conftest.py); backends
# initialise lazily, so updating the config before first device use wins.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax  # noqa: E402  (a no-op re-import when sitecustomize already did)

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

F = 262          # motion features
TD = 768         # text dim
DEN_L, DEN_FF, DEN_LAYERS, DEN_HEADS = 1024, 2048, 8, 8   # in2IN denoisers
MIX_L, MIX_FF, MIX_BLOCKS, MIX_HEADS = 512, 1024, 4, 8    # mixer core
N_TRAIN_STEPS = 1000
CFG_W = 3.5


def _write_stats(root: str) -> None:
    d = os.path.join(root, "data")
    os.makedirs(os.path.join(d, "HumanML3D"), exist_ok=True)
    rng = np.random.default_rng(42)
    for path in ("global_mean.npy", os.path.join("HumanML3D", "mean_ih_new.npy")):
        np.save(os.path.join(d, path), (0.1 * rng.standard_normal(F)).astype(np.float32))
    for path in ("global_std.npy", os.path.join("HumanML3D", "std_ih_new.npy")):
        np.save(os.path.join(d, path), (0.5 + rng.random(F)).astype(np.float32))


def _perturb_zero_init(module, std=0.05, seed=0):
    """Zero-init output layers make denoiser outputs constant (degenerate
    for the per-step alignment math); nudge them like training would."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if ".out." in name or name.startswith("out."):
                p.add_(torch.randn(p.shape, generator=g) * std)


def build_reference(steps: int):
    """Full-size reference Mixer + respaced MixerDiffusion, live torch."""
    import torch
    from reference_compat import import_reference

    in2in = import_reference("models.in2in")
    mixermdm = import_reference("models.mixermdm")
    gd = import_reference("models.utils.gaussian_diffusion")
    cfg_sampler = import_reference("models.utils.cfg_sampler")

    torch.manual_seed(0)
    den1 = in2in.in2INDenoiser(
        input_feats=F, mode="individual", latent_dim=DEN_L, num_frames=300,
        ff_size=DEN_FF, num_layers=DEN_LAYERS, num_heads=DEN_HEADS, dropout=0.0,
    ).eval()
    den2 = in2in.in2INDenoiser(
        input_feats=F, mode="interaction", latent_dim=DEN_L, num_frames=300,
        ff_size=DEN_FF, num_layers=DEN_LAYERS, num_heads=DEN_HEADS, dropout=0.0,
    ).eval()
    _perturb_zero_init(den1, seed=1)
    _perturb_zero_init(den2, seed=2)

    torch.manual_seed(3)
    mixer = mixermdm.Mixer(
        den1, den2, nfeats=F, latent_dim=MIX_L, ff_size=MIX_FF, text_dim=TD,
        n_blocks=MIX_BLOCKS, n_heads=MIX_HEADS, mixing_mode=4,
        mode="eval_intermediate", align=True,
    ).eval()
    _perturb_zero_init(mixer.influence, std=0.2, seed=4)

    betas = gd.get_named_beta_schedule("cosine", N_TRAIN_STEPS)
    use = gd.space_timesteps(N_TRAIN_STEPS, f"ddim{steps}")
    diffusion = gd.MixerDiffusion(
        use_timesteps=use, align=True, betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
    )
    model = cfg_sampler.ClassifierFreeSampleModelX2(mixer, CFG_W)
    return mixer, model, diffusion, sorted(use)


def convert_to_ours(mixer_t):
    """Convert the torch modules' weights and build our jitted chain fn."""
    import jax

    from mixermdm_tpu.diffusion.mixer_diffusion import ddim_sample_loop_x2
    from mixermdm_tpu.diffusion.schedule import (
        get_named_beta_schedule,
        make_schedule,
        space_timesteps,
    )
    from mixermdm_tpu.models.cfg import cfg_model_x2
    from mixermdm_tpu.models.in2in import In2INDenoiser
    from mixermdm_tpu.models.mixer import MixerConfig, MixerCore, make_mixer_forward
    from mixermdm_tpu.train.checkpoint import (
        convert_in2in_denoiser,
        convert_mixer_core,
    )
    from mixermdm_tpu.utils.normalizer import load_normalizer

    def _sd(module):
        return {k: v.detach().numpy() for k, v in module.state_dict().items()}

    den1 = In2INDenoiser(input_feats=F, mode="individual", latent_dim=DEN_L,
                         ff_size=DEN_FF, num_layers=DEN_LAYERS,
                         num_heads=DEN_HEADS, dropout=0.0)
    den2 = In2INDenoiser(input_feats=F, mode="interaction", latent_dim=DEN_L,
                         ff_size=DEN_FF, num_layers=DEN_LAYERS,
                         num_heads=DEN_HEADS, dropout=0.0)
    cfg = MixerConfig(nfeats=F, latent_dim=MIX_L, ff_size=MIX_FF,
                      n_blocks=MIX_BLOCKS, n_heads=MIX_HEADS, text_dim=TD,
                      mixing_mode=4, align=True)
    core = MixerCore(nfeats=F, latent_dim=MIX_L, ff_size=MIX_FF,
                     n_blocks=MIX_BLOCKS, n_heads=MIX_HEADS, text_dim=TD,
                     mixing_mode=4, dropout=0.0)
    n1 = load_normalizer("data/HumanML3D/mean_ih_new.npy",
                         "data/HumanML3D/std_ih_new.npy")
    n2 = load_normalizer("data/global_mean.npy", "data/global_std.npy")
    fwd = make_mixer_forward(
        cfg,
        lambda p, x, t, m, c: den1.apply({"params": p}, x, t, m, c),
        lambda p, x, t, m, c: den2.apply({"params": p}, x, t, m, c),
        lambda p, *a, train=False, rngs=None: core.apply(
            {"params": p}, *a, train=train, rngs=rngs),
        n1, n2, compute_dtype=None,
    )
    mixer_sd = _sd(mixer_t)
    params = {
        "core": convert_mixer_core(mixer_sd, MIX_BLOCKS, prefix=""),
        "denoiser1": convert_in2in_denoiser(
            _sd(mixer_t.denoiser1), "", DEN_LAYERS, has_cross=True),
        "denoiser2": convert_in2in_denoiser(
            _sd(mixer_t.denoiser2), "", DEN_LAYERS, has_cross=True),
    }
    mixer_eval = lambda x, x2, t, m, c: fwd(params, x, t, c, m, x2)[0]

    def chain(steps: int):
        betas = get_named_beta_schedule("cosine", N_TRAIN_STEPS)
        s = make_schedule(betas, space_timesteps(N_TRAIN_STEPS, f"ddim{steps}"))

        def run(noise, cond, mask):
            return ddim_sample_loop_x2(
                cfg_model_x2(mixer_eval, CFG_W), s, noise.shape,
                jax.random.PRNGKey(0), cond, mask=mask,
                normalizer1=n1, normalizer2=n2, align=True, nfeats=F,
                noise=noise,
            )

        return jax.jit(run)

    return chain


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5,
                    help="DDIM respacing for the timed chain (cost ~ linear)")
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--frames", type=int, default=299)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch thread count; 0 = sweep {1,8,16,32} on one "
                         "denoiser forward and keep the fastest")
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-jax", action="store_true")
    args = ap.parse_args()

    B, T, steps = args.batch, args.frames, args.steps

    tmp = tempfile.mkdtemp(prefix="refcpu_")
    _write_stats(tmp)
    os.chdir(tmp)  # the reference Mixer loads ./data/*.npy CWD-relative

    import torch

    rng = np.random.default_rng(7)
    noise = rng.standard_normal((B, T, 2 * F)).astype(np.float32)
    cond = (0.2 * rng.standard_normal((B, 8 * TD))).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)

    print(f"building full-size reference (den {DEN_L}d x{DEN_LAYERS}, "
          f"mixer {MIX_L}d x{MIX_BLOCKS}) ...", file=sys.stderr)
    mixer_t, model_t, diffusion_t, _ = build_reference(steps)

    result: dict = {
        "metric": f"same-host CPU chain A/B (B={B}, T={T}, ddim{steps}, f32)",
        "unit": "s/step",
    }

    ref_out = None
    if not args.skip_torch:
        if args.threads:
            best_threads = args.threads
        else:
            # pick the torch thread count most favourable to the reference
            x_probe = torch.from_numpy(
                np.concatenate([noise, noise], axis=0))  # CFG-doubled batch
            c_probe = torch.from_numpy(
                np.concatenate([cond[:, 3 * TD:6 * TD]] * 2, axis=0))
            t_probe = torch.zeros(2 * B, dtype=torch.long)
            m_probe = torch.from_numpy(np.concatenate([mask] * 2, axis=0))
            sweep = {}
            for k in (1, 8, 16, 32):
                torch.set_num_threads(k)
                with torch.no_grad():
                    mixer_t.denoiser2(x_probe, t_probe,
                                                 mask=m_probe, cond=c_probe)
                    t0 = time.perf_counter()
                    mixer_t.denoiser2(x_probe, t_probe,
                                                 mask=m_probe, cond=c_probe)
                    sweep[k] = time.perf_counter() - t0
                print(f"  torch denoiser fwd @ {k} threads: {sweep[k]:.3f} s",
                      file=sys.stderr)
            best_threads = min(sweep, key=sweep.get)
        torch.set_num_threads(best_threads)
        result["torch_threads"] = best_threads

        print(f"timing torch ddim{steps} chain @ {best_threads} threads ...",
              file=sys.stderr)
        with torch.no_grad():
            t0 = time.perf_counter()
            ref_out = diffusion_t.ddim_sample_loop(
                model_t, (B, T, 2 * F), noise=torch.from_numpy(noise),
                clip_denoised=False,
                model_kwargs={"cond": torch.from_numpy(cond),
                              "mask": torch.from_numpy(mask)},
            )
            torch_total = time.perf_counter() - t0
        result["torch_s_per_step"] = round(torch_total / steps, 4)
        result["torch_ddim50_projected_s"] = round(torch_total / steps * 50, 2)
        result["torch_samples_per_sec_ddim50"] = round(
            B / (torch_total / steps * 50), 4)
        print(f"  torch: {torch_total:.1f} s total, "
              f"{torch_total / steps:.2f} s/step", file=sys.stderr)

    if not args.skip_jax:
        import jax

        print("converting weights + compiling our XLA CPU chain ...",
              file=sys.stderr)
        chain = convert_to_ours(mixer_t)(steps)
        jn, jc, jm = map(np.asarray, (noise, cond, mask))
        t0 = time.perf_counter()
        ours = jax.block_until_ready(chain(jn, jc, jm))
        compile_and_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        ours = jax.block_until_ready(chain(jn, jc, jm))
        jax_total = time.perf_counter() - t0
        result["jax_cpu_compile_plus_first_s"] = round(compile_and_first, 2)
        result["jax_cpu_s_per_step"] = round(jax_total / steps, 4)
        result["jax_cpu_ddim50_projected_s"] = round(jax_total / steps * 50, 2)
        result["jax_cpu_samples_per_sec_ddim50"] = round(
            B / (jax_total / steps * 50), 4)
        print(f"  ours (XLA CPU): {jax_total:.1f} s steady, "
              f"{jax_total / steps:.2f} s/step", file=sys.stderr)

        if ref_out is not None:
            a, b = np.asarray(ours), ref_out.numpy()
            result["final_rel_l2_vs_torch"] = round(
                float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)), 4)

    if "torch_s_per_step" in result and "jax_cpu_s_per_step" in result:
        result["speedup_same_host"] = round(
            result["torch_s_per_step"] / result["jax_cpu_s_per_step"], 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
