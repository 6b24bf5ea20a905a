"""End-to-end system tests on miniature configs (CPU fake backend).

Covers SURVEY.md §7 stages 6-7: one-model slice (in2IN individual), the
interaction model, and the full MixerMDM dual-stream composition with CFG.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.config import Config, tiny_config
from mixermdm_tpu.models.clip_text import ClipTextConfig
from mixermdm_tpu.systems import In2INSystem, MixerMDMSystem, generate_src_mask

TINY_CLIP = ClipTextConfig.tiny()
T, B = 12, 2


def tiny_cfg(**kw):
    c = tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8)
    c.update(kw)
    return c


def batch_texts():
    return {
        "text": ["two people hug each other"] * B,
        "text_individual1": ["a person hugs"] * B,
        "text_individual2": ["a person hugs back"] * B,
        "motion_lens": np.asarray([T] * B),
    }


class TestSrcMask:
    def test_mask_matches_lengths(self):
        m = generate_src_mask(10, jnp.asarray([4, 10]), 2)
        assert m.shape == (2, 10, 2)
        np.testing.assert_allclose(np.asarray(m[0, :, 0]), [1, 1, 1, 1, 0, 0, 0, 0, 0, 0])
        np.testing.assert_allclose(np.asarray(m[1, :, 0]), np.ones(10))


class TestIn2INIndividual:
    def test_sample_and_loss(self):
        sys = In2INSystem(tiny_cfg(), mode="individual", clip_cfg=TINY_CLIP)
        params = sys.init_params(jax.random.PRNGKey(0))

        cond = sys.text_process(params, ["a person walks"] * B, "individual")
        assert cond.shape == (B, TINY_CLIP.width)

        # Pad cond to 768 not needed: denoiser slices cond[:, :768] but cond is
        # width-sized here; the denoiser text_embed adapts to the tiny width.
        out = sys.sample(params, jnp.tile(cond, (1, 1)), T, jax.random.PRNGKey(1))
        assert out.shape == (B, T, 262)
        assert bool(jnp.isfinite(out).all())

        motions = jax.random.normal(jax.random.PRNGKey(2), (B, T, 262))
        losses = sys.compute_loss(
            params, motions, jnp.asarray([T, T - 2]), cond, jax.random.PRNGKey(3)
        )
        assert "total" in losses and bool(jnp.isfinite(losses["total"]))


class TestIn2INInteraction:
    def test_sample_and_loss(self):
        sys = In2INSystem(tiny_cfg(), mode="interaction", clip_cfg=TINY_CLIP)
        params = sys.init_params(jax.random.PRNGKey(0))
        cond = sys.build_cond(params, batch_texts())
        assert cond.shape == (B, 3 * TINY_CLIP.width)

        out = sys.sample(params, cond, T, jax.random.PRNGKey(1))
        assert out.shape == (B, T, 524)
        assert bool(jnp.isfinite(out).all())

        motions = jax.random.normal(jax.random.PRNGKey(2), (B, T, 524))
        losses = sys.compute_loss(
            params, motions, jnp.asarray([T, T]), cond, jax.random.PRNGKey(3)
        )
        assert bool(jnp.isfinite(losses["total"]))


def tiny_mixer(sampler: str = "uniform", force_influence_val=None):
    mixer_cfg = Config.wrap(
        {
            "NAME": "MixerMDM",
            "GENERATOR": {"NUM_LAYERS": 1, "NUM_HEADS": 2, "DROPOUT": 0.0,
                          "INPUT_DIM": 262, "LATENT_DIM": 32, "FF_SIZE": 64},
            "DISCRIMINATOR": {"NUM_LAYERS": 1, "NUM_HEADS": 2, "DROPOUT": 0.0,
                              "INPUT_DIM": 262, "LATENT_DIM": 32, "FF_SIZE": 64},
            "ACTIVATION": "gelu", "DIFFUSION_STEPS": 8, "BETA_SCHEDULER": "cosine",
            "SAMPLER": sampler, "MOTION_REP": "global", "T_BAR": 4,
            "STRATEGY": "ddim4", "CFG_WEIGHT": 3.5, "MIXING_MODE": 4,
            "FORCE_INFLUENCE_VAL": force_influence_val,
        }
    )
    m1 = In2INSystem(tiny_cfg(), mode="individual", clip_cfg=TINY_CLIP)
    m2 = In2INSystem(tiny_cfg(), mode="interaction", clip_cfg=TINY_CLIP)
    return MixerMDMSystem(mixer_cfg, model1=m1, model2=m2, clip_cfg=TINY_CLIP)


class TestMixerMDM:
    @pytest.fixture(scope="class")
    def sys_params(self):
        sys = tiny_mixer()
        params = sys.init_params(jax.random.PRNGKey(0))
        return sys, params

    def test_generate_cond_layout(self, sys_params):
        sys, params = sys_params
        cond = sys.generate_cond(params, batch_texts())
        # 8 blocks of the tiny clip width (768 in production).
        assert cond.shape == (B, 8 * TINY_CLIP.width)

    def test_forward_test_full_chain(self, sys_params):
        sys, params = sys_params
        # Note: tiny clip width means cond slicing uses tiny text dims too.
        sys.mixer_cfg = sys.mixer_cfg  # static
        out = sys.forward_test(params, batch_texts(), jax.random.PRNGKey(1))
        assert out.shape == (B, T, 524)
        assert bool(jnp.isfinite(out).all())

    def test_adversarial_losses(self, sys_params):
        sys, params = sys_params
        cond = sys.generate_cond(params, batch_texts())
        motions = jax.random.normal(jax.random.PRNGKey(2), (B, T, 524)) * 0.1
        lens = jnp.asarray([T, T - 3])
        for mode in ("generator", "discriminator"):
            losses = sys.compute_loss(
                params, motions, lens, cond, jax.random.PRNGKey(3), mode=mode
            )
            assert bool(jnp.isfinite(losses["total"])), mode

    def test_generator_grads_flow_only_to_mixer(self, sys_params):
        sys, params = sys_params
        # Perturb the frozen denoisers' zero-init output layers: with exactly
        # zero denoiser outputs, out1 == out2 and the mixed output does not
        # depend on the influence net (zero grad is then *correct*).
        params = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(7), x.shape),
            params,
        )
        cond = sys.generate_cond(params, batch_texts())
        motions = jax.random.normal(jax.random.PRNGKey(4), (B, T, 524)) * 0.1
        # NOTE: lengths < T, so padding frames exist — the faithful
        # "reference" hinge-mask mode averages the GAN loss over padding
        # frames (see mixer_diffusion._hinge_weight); with full-length
        # sequences the loss is identically zero.
        lens = jnp.asarray([T - 3, T - 5])

        def loss_fn(p):
            return sys._loss_impl(
                p, motions, lens, cond, jax.random.PRNGKey(5),
                mode="generator", i_loss_factor=1.0, I_loss_factor=2.0, l1=0.1,
                cond_mask_prob=0.0,
            )["total"]

        grads = jax.grad(loss_fn)(params)
        g_core = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.abs(b).sum()), grads["core"], 0.0
        )
        g_disc = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.abs(b).sum()), grads["disc_i"], 0.0
        )
        assert g_core > 0.0       # generator params receive gradient
        assert g_disc == 0.0      # discriminators are frozen on the G step


class TestJittedCondEncoders:
    """The token->cond encoders are lazily jitted (eager per-op CLIP dispatch
    costs seconds over a device tunnel); the compiled program must match the
    eager trace."""

    def test_mixer_encode_cond_jit_matches_eager(self):
        import os
        import sys as _s

        _s.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from __graft_entry__ import _tiny_system

        system = _tiny_system()
        params = system.init_params(jax.random.PRNGKey(0))
        ctx = system.text.clip_cfg.context_length
        tok = (jnp.zeros((2, ctx), jnp.int32)
               .at[:, 0].set(49406).at[:, 1].set(49407).at[0, 1].set(320))
        jitted = system.encode_cond(params, tok, tok, tok)
        eager = system._encode_cond_impl(params, tok, tok, tok)
        np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                                   rtol=2e-5, atol=2e-6)

    def test_in2in_build_cond_routes_through_jitted_encoder(self):
        from mixermdm_tpu.config import tiny_config
        from mixermdm_tpu.models.clip_text import ClipTextConfig
        from mixermdm_tpu.systems import In2INSystem

        sys_ = In2INSystem(
            tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8),
            mode="dual", clip_cfg=ClipTextConfig.tiny(),
        )
        params = sys_.init_params(jax.random.PRNGKey(0))
        batch = {"text": ["two people dance"] * 2,
                 "text_individual1": ["a person dances"] * 2,
                 "text_individual2": ["a person spins"] * 2}
        cond = sys_.build_cond(params, batch)
        toks = sys_.tokenize_batch(batch)
        eager = sys_._encode_cond_tokens_impl(params, toks)
        assert cond.shape == (2, 5 * sys_.text_dim)
        np.testing.assert_allclose(np.asarray(cond), np.asarray(eager),
                                   rtol=2e-5, atol=2e-6)
