"""Trainer behaviour tests: losses move, D/G alternation, finetune masks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.config import tiny_config
from mixermdm_tpu.models.clip_text import ClipTextConfig
from mixermdm_tpu.systems import In2INSystem
from mixermdm_tpu.train.trainer import BaseTrainer, MixerTrainer


class TestBaseTrainerLearns:
    def test_loss_decreases_on_fixed_batch(self):
        sys_ = In2INSystem(
            tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8),
            mode="individual", clip_cfg=ClipTextConfig.tiny(),
        )
        params = sys_.init_params(jax.random.PRNGKey(0))
        trainer = BaseTrainer(sys_, lr=3e-3)
        state = trainer.init_state(params)

        B, T = 4, 12
        ctx = sys_.text.clip_cfg.context_length
        batch = {
            "motions": jax.random.normal(jax.random.PRNGKey(1), (B, T, 262)) * 0.3,
            "motion_lens": jnp.asarray([T] * B),
            "tokens": jnp.zeros((B, ctx), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407),
        }
        first = None
        for i in range(12):
            state, losses = trainer.step(state, batch, jax.random.PRNGKey(100))
            if first is None:
                first = float(losses["total"])
        last = float(losses["total"])
        assert np.isfinite(last)
        assert last < first, f"loss did not decrease: {first} -> {last}"


class TestMixerTrainerAlternation:
    def test_g_and_d_update_disjoint_params(self):
        import sys as _s, os

        _s.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from __graft_entry__ import _tiny_system

        system = _tiny_system()
        params = system.init_params(jax.random.PRNGKey(0))
        # Perturb so frozen-denoiser outputs differ (else G grads are zero).
        params = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(7), x.shape), params
        )
        trainer = MixerTrainer(system, lr=1e-3, grad_acc_steps=1)
        state = trainer.init_state(params)

        B, T = 2, 12
        ctx = system.text.clip_cfg.context_length
        batch = {
            "motions": jax.random.normal(jax.random.PRNGKey(1), (B, T, 524)) * 0.1,
            "motion_lens": jnp.asarray([T - 2, T - 4]),
            "tokens_inter": jnp.zeros((B, ctx), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407),
            "tokens_i1": jnp.zeros((B, ctx), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407),
            "tokens_i2": jnp.zeros((B, ctx), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407),
        }

        def l1_diff(a, b):
            return sum(
                float(jnp.abs(x - y).sum())
                for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
            )

        s1, g_losses = trainer.generator_step(state, batch, jax.random.PRNGKey(2))
        assert l1_diff(state.params["core"], s1.params["core"]) > 0
        assert l1_diff(state.params["disc_i"], s1.params["disc_i"]) == 0
        assert l1_diff(state.params["model1"], s1.params["model1"]) == 0  # frozen

        s2, d_losses = trainer.discriminator_step(s1, batch, jax.random.PRNGKey(3))
        assert l1_diff(s1.params["disc_i"], s2.params["disc_i"]) > 0
        assert l1_diff(s1.params["core"], s2.params["core"]) == 0


class TestFinetune:
    def test_sa_block_mask(self):
        from mixermdm_tpu.train.finetune import sa_block_freeze_mask

        params = {
            "blocks_0": {
                "sa_block": {"attention": {"q_proj": {"kernel": 1}}},
                "ca_block": {"attention": {"q_proj": {"kernel": 1}}},
            },
            "out": {"kernel": 1},
        }
        mask = sa_block_freeze_mask(params)
        assert mask["blocks_0"]["sa_block"]["attention"]["q_proj"]["kernel"] is False
        assert mask["blocks_0"]["ca_block"]["attention"]["q_proj"]["kernel"] is True
        assert mask["out"]["kernel"] is True

    def test_individual_to_interaction_transfer(self):
        from mixermdm_tpu.train.finetune import individual_to_interaction_params

        src = {"blocks_0": {"sa_block": {"w": np.asarray([1.0])}}, "out": {"w": np.asarray([2.0])}}
        tmpl = {
            "blocks_0": {"sa_block": {"w": np.asarray([0.0])},
                         "ca_block": {"w": np.asarray([5.0])}},
            "out": {"w": np.asarray([0.0])},
        }
        merged = individual_to_interaction_params(src, tmpl)
        assert merged["blocks_0"]["sa_block"]["w"][0] == 1.0   # transferred
        assert merged["blocks_0"]["ca_block"]["w"][0] == 5.0   # fresh init kept
        assert merged["out"]["w"][0] == 2.0
