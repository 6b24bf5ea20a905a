"""System tests for the remaining model families: MDM, InterGen, DualMDM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.config import tiny_config
from mixermdm_tpu.models.clip_text import ClipTextConfig
from mixermdm_tpu.systems import In2INSystem, InterGenSystem, MDMSystem, load_dualmdm

TINY_CLIP = ClipTextConfig.tiny()
T, B = 12, 2


def tiny_cfg(**kw):
    c = tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8)
    c.update(kw)
    return c


class TestMDMSystem:
    @pytest.fixture(scope="class")
    def sys_params(self):
        sys_ = MDMSystem(tiny_cfg(), clip_cfg=TINY_CLIP)
        return sys_, sys_.init_params(jax.random.PRNGKey(0))

    def test_text_process_layout(self, sys_params):
        sys_, params = sys_params
        cond = sys_.text_process(params, ["a person walks"] * B)
        assert cond.shape == (B, 32)  # projected to LATENT_DIM

    def test_sample(self, sys_params):
        sys_, params = sys_params
        out = sys_.forward_test(
            params, {"text": ["a person walks"] * B, "motion_lens": np.asarray([T] * B)},
            jax.random.PRNGKey(1),
        )
        assert out.shape == (B, T, 262)
        assert bool(jnp.isfinite(out).all())

    def test_loss(self, sys_params):
        sys_, params = sys_params
        cond = sys_.text_process(params, ["x"] * B)
        losses = sys_.compute_loss(
            params, jax.random.normal(jax.random.PRNGKey(2), (B, T, 262)),
            jnp.asarray([T, T - 2]), cond, jax.random.PRNGKey(3),
        )
        assert bool(jnp.isfinite(losses["total"]))


class TestInterGenSystem:
    @pytest.fixture(scope="class")
    def sys_params(self):
        sys_ = InterGenSystem(tiny_cfg(), clip_cfg=TINY_CLIP)
        return sys_, sys_.init_params(jax.random.PRNGKey(0))

    def test_sample(self, sys_params):
        sys_, params = sys_params
        out = sys_.forward_test(
            params, {"text": ["two people dance"] * B, "motion_lens": np.asarray([T] * B)},
            jax.random.PRNGKey(1),
        )
        assert out.shape == (B, T, 524)
        assert bool(jnp.isfinite(out).all())

    def test_loss(self, sys_params):
        sys_, params = sys_params
        cond = sys_.text_process(params, ["x"] * B)
        losses = sys_.compute_loss(
            params, jax.random.normal(jax.random.PRNGKey(2), (B, T, 524)),
            jnp.asarray([T, T]), cond, jax.random.PRNGKey(3),
        )
        assert bool(jnp.isfinite(losses["total"]))


class TestDualMDM:
    def test_dual_sampling(self):
        cfg = tiny_cfg(W_FUNC="const", W_VALUE=0.5)
        sys_ = load_dualmdm(cfg, clip_cfg=TINY_CLIP)
        assert isinstance(sys_, In2INSystem) and sys_.mode == "dual"
        params = sys_.init_params(jax.random.PRNGKey(0))
        batch = {
            "text": ["two people hug"] * B,
            "text_individual1": ["p1"] * B,
            "text_individual2": ["p2"] * B,
            "motion_lens": np.asarray([T] * B),
        }
        cond = sys_.build_cond(params, batch)
        assert cond.shape == (B, 5 * TINY_CLIP.width)
        out = sys_.sample(params, cond, T, jax.random.PRNGKey(1))
        assert out.shape == (B, T, 524)
        assert bool(jnp.isfinite(out).all())

    @pytest.mark.parametrize("func,value", [("exp", 0.001), ("exp-inv", 0.001),
                                            ("lin", 0.0), ("const", 0.3)])
    def test_weight_schedules(self, func, value):
        from mixermdm_tpu.models.cfg import dual_mdm_weight_fn

        w = dual_mdm_weight_fn(func, value)
        val = float(w(jnp.asarray(500.0)))
        assert np.isfinite(val) and 0.0 <= val <= 1.0


class TestMixerFactoryCombos:
    """MixerMDM with MDM / InterGen submodels (reference mixermdm.py:32-40).

    NOTE: in the reference the MDM pairing is broken by the text_dim=256
    mis-slice (SURVEY.md §2.4); here dims wire from actual cond widths.
    """

    def _mixer_cfg(self):
        from mixermdm_tpu.config import Config

        return Config.wrap(
            {
                "NAME": "MixerMDM",
                "GENERATOR": {"NUM_LAYERS": 1, "NUM_HEADS": 2, "DROPOUT": 0.0,
                              "INPUT_DIM": 262, "LATENT_DIM": 32, "FF_SIZE": 64},
                "DISCRIMINATOR": {"NUM_LAYERS": 1, "NUM_HEADS": 2, "DROPOUT": 0.0,
                                  "INPUT_DIM": 262, "LATENT_DIM": 32, "FF_SIZE": 64},
                "ACTIVATION": "gelu", "DIFFUSION_STEPS": 8, "BETA_SCHEDULER": "cosine",
                "SAMPLER": "uniform", "MOTION_REP": "global", "T_BAR": 4,
                "STRATEGY": "ddim4", "CFG_WEIGHT": 3.5, "MIXING_MODE": 4,
                "FORCE_INFLUENCE_VAL": None,
            }
        )

    def test_mdm_plus_intergen(self):
        from mixermdm_tpu.systems.mixermdm import build_mixer_system

        cfg1 = tiny_cfg(NAME="MDM")
        cfg2 = tiny_cfg(NAME="InterGen")
        system = build_mixer_system(self._mixer_cfg(), cfg1, cfg2, clip_cfg=TINY_CLIP)
        params = system.init_params(jax.random.PRNGKey(0))
        batch = {
            "text": ["two people greet"] * B,
            "text_individual1": ["p1 waves"] * B,
            "text_individual2": ["p2 waves"] * B,
            "motion_lens": np.asarray([T] * B),
        }
        out = system.forward_test(params, batch, jax.random.PRNGKey(1))
        assert out.shape == (B, T, 524)
        assert bool(jnp.isfinite(out).all())
