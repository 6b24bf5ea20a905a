"""Quality probe for the W8A8 frozen-denoiser path.

Generates the bench workload (B=10, T=299, DDIM-50) from identical params +
seed under three precision policies and reports pairwise output deltas:

  f32     : full-precision transformer compute (reference-faithful)
  bf16    : the production default (Pallas fused blocks)
  w8a8    : bf16 + int8 frozen-denoiser projections (QUANT_FROZEN)

If |w8a8 - bf16| is comparable to |bf16 - f32|, the int8 path adds no new
error class beyond what the existing mixed-precision policy already accepts.

Usage: python scripts/quant_quality.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def build(quant: bool, dtype: str):
    from mixermdm_tpu.config import (
        IN2IN_INDIVIDUAL_DEFAULT, IN2IN_INTERACTION_DEFAULT,
        MIXERMDM_DEFAULT, Config,
    )
    from mixermdm_tpu.models.clip_text import ClipTextConfig
    from mixermdm_tpu.systems import In2INSystem, MixerMDMSystem

    clip_cfg = ClipTextConfig.vit_l_14()
    m1 = In2INSystem(IN2IN_INDIVIDUAL_DEFAULT, mode="individual", clip_cfg=clip_cfg)
    m2 = In2INSystem(IN2IN_INTERACTION_DEFAULT, mode="interaction", clip_cfg=clip_cfg)
    mcfg = Config.wrap(dict(MIXERMDM_DEFAULT))
    mcfg["QUANT_FROZEN"] = quant
    return MixerMDMSystem(mcfg, model1=m1, model2=m2, clip_cfg=clip_cfg,
                          compute_dtype=dtype)


def main():
    from mixermdm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, T = 10, 299
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, 8 * 768))
    rng = jax.random.PRNGKey(2)

    def perturb(params):
        # Zero-init output layers make fresh models emit ~0; nudge every
        # param so the probe exercises real activations.
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef,
            [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)],
        )

    outs = {}
    for name, (quant, dtype) in {
        "f32": (False, "f32"),
        "bf16": (False, "auto"),
        "w8a8": (True, "auto"),
    }.items():
        system = build(quant, dtype)
        params = perturb(system.init_params(jax.random.PRNGKey(0)))
        out = system.sample(params, cond, T, rng)
        out = out[0] if isinstance(out, tuple) else out
        outs[name] = np.asarray(out, np.float64)
        print(f"# {name}: generated {outs[name].shape}", file=sys.stderr)

    for name, o in outs.items():
        print(f"{name}: nan-fraction {np.isnan(o).mean():.4f}")
    finite = np.ones(outs["f32"].shape, bool)
    for o in outs.values():
        finite &= np.isfinite(o)
    print(f"jointly finite: {finite.mean():.4f}")
    ref_std = outs["f32"][finite].std()
    for a, b in [("bf16", "f32"), ("w8a8", "f32"), ("w8a8", "bf16")]:
        d = (outs[a] - outs[b])[finite]
        ob = outs[b][finite]
        print(f"{a} vs {b}: rel-L2 {np.linalg.norm(d) / np.linalg.norm(ob):.4f}  "
              f"max|d|/std {np.abs(d).max() / ref_std:.4f}")

    # Single full-size denoiser forward (per-step error, no chain effects).
    from mixermdm_tpu.models import layers as L

    system = build(False, "auto")
    params = perturb(system.init_params(jax.random.PRNGKey(0)))
    p1 = params["model2"]["denoiser_interaction"]
    apply_bf = system.model2.denoiser_apply("interaction", cast=True, quant=False)
    apply_q8 = system.model2.denoiser_apply("interaction", cast=True, quant=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, 524))
    c = jax.random.normal(jax.random.PRNGKey(6), (B, 3 * 768)) * 0.2
    t = jnp.full((B,), 25, jnp.int32)
    apply_f32 = system.model2.denoiser_apply("interaction", cast=False)
    o_bf = np.asarray(jax.jit(apply_bf)(p1, x, t, None, c), np.float64)
    o_q8 = np.asarray(jax.jit(apply_q8)(p1, x, t, None, c), np.float64)
    o_32 = np.asarray(jax.jit(apply_f32)(p1, x, t, None, c), np.float64)
    n32 = max(np.linalg.norm(o_32), 1e-9)
    print(f"single denoiser fwd, w8a8 vs bf16: "
          f"rel-L2 {np.linalg.norm(o_q8 - o_bf) / max(np.linalg.norm(o_bf), 1e-9):.4f}")
    print(f"single denoiser fwd, bf16 vs f32:  "
          f"rel-L2 {np.linalg.norm(o_bf - o_32) / n32:.4f}")
    print(f"single denoiser fwd, w8a8 vs f32:  "
          f"rel-L2 {np.linalg.norm(o_q8 - o_32) / n32:.4f}")


if __name__ == "__main__":
    main()
