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


class TestNanGuard:
    """Failure detection (--nan-guard): non-finite gradients skip the update
    in-graph instead of poisoning the params/moments; finite steps proceed
    and reset the consecutive-error counter."""

    def _setup(self, nan_guard):
        sys_ = In2INSystem(
            tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8),
            mode="individual", clip_cfg=ClipTextConfig.tiny(),
        )
        params = sys_.init_params(jax.random.PRNGKey(0))
        trainer = BaseTrainer(sys_, lr=3e-3, nan_guard=nan_guard)
        state = trainer.init_state(params)
        B, T = 4, 12
        ctx = sys_.text.clip_cfg.context_length
        batch = {
            "motions": jax.random.normal(jax.random.PRNGKey(1), (B, T, 262)) * 0.3,
            "motion_lens": jnp.asarray([T] * B),
            "tokens": jnp.zeros((B, ctx), jnp.int32)
            .at[:, 0].set(49406).at[:, 1].set(49407),
        }
        return trainer, state, batch

    @staticmethod
    def _flat(tree):
        return jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(tree)]
        )

    def test_nan_batch_skips_update_then_recovers(self):
        from mixermdm_tpu.train.optim import notfinite_count

        trainer, state, batch = self._setup(nan_guard=10)
        bad = dict(batch)
        bad["motions"] = batch["motions"].at[0, 0, 0].set(jnp.nan)

        p0 = self._flat(state.params)
        s1, losses = trainer.step(state, bad, jax.random.PRNGKey(2))
        assert jnp.array_equal(p0, self._flat(s1.params)), \
            "NaN batch must not change params"
        assert int(notfinite_count(s1.opt_state)) == 1

        s2, losses = trainer.step(s1, batch, jax.random.PRNGKey(3))
        assert not jnp.array_equal(p0, self._flat(s2.params)), \
            "finite batch must update params"
        assert bool(jnp.isfinite(self._flat(s2.params)).all())
        assert int(notfinite_count(s2.opt_state)) == 0  # reset on success

    def test_guard_off_is_the_default_chain(self):
        from mixermdm_tpu.train.optim import notfinite_count

        trainer, state, batch = self._setup(nan_guard=0)
        s1, _ = trainer.step(state, batch, jax.random.PRNGKey(2))
        assert int(notfinite_count(s1.opt_state)) == 0

    def test_mixer_trainer_guard_covers_both_sides(self):
        import sys as _s, os

        _s.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from __graft_entry__ import _tiny_system
        from mixermdm_tpu.train.optim import notfinite_count

        system = _tiny_system()
        params = system.init_params(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(7), x.shape),
            params,
        )
        trainer = MixerTrainer(system, lr=1e-3, grad_acc_steps=1, nan_guard=5)
        state = trainer.init_state(params)
        B, T = 2, 12
        ctx = system.text.clip_cfg.context_length
        tok = (jnp.zeros((B, ctx), jnp.int32)
               .at[:, 0].set(49406).at[:, 1].set(49407))
        batch = {
            "motions": jax.random.normal(jax.random.PRNGKey(1), (B, T, 524)) * 0.1,
            "motion_lens": jnp.asarray([T - 2, T - 4]),
            "tokens_inter": tok, "tokens_i1": tok, "tokens_i2": tok,
        }
        bad = dict(batch)
        bad["motions"] = batch["motions"].at[:].set(jnp.nan)

        p0 = self._flat(state.params)
        s1, g_losses, d_losses = trainer.fit_step(
            state, bad, jax.random.PRNGKey(2), batch_idx=0
        )
        assert jnp.array_equal(p0, self._flat(s1.params))
        assert int(notfinite_count(s1.opt_gen)) == 1
        assert int(notfinite_count(s1.opt_disc)) == 1

        s2, g_losses, d_losses = trainer.fit_step(
            s1, batch, jax.random.PRNGKey(3), batch_idx=1
        )
        assert not jnp.array_equal(p0, self._flat(s2.params))
        assert bool(jnp.isfinite(self._flat(s2.params)).all())


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


class TestTrainPrecisionKnobs:
    """bf16 discriminator compute + the differentiated-stack remat toggle."""

    def _setup(self):
        import sys as _s, os

        _s.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from __graft_entry__ import _tiny_system

        system = _tiny_system()
        params = system.init_params(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(7), x.shape), params
        )
        B, T = 2, 12
        ctx = system.text.clip_cfg.context_length
        tok = jnp.zeros((B, ctx), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407)
        batch = {
            "motions": jax.random.normal(jax.random.PRNGKey(1), (B, T, 524)) * 0.1,
            "motion_lens": jnp.asarray([T - 2, T - 4]),
            "tokens_inter": tok, "tokens_i1": tok, "tokens_i2": tok,
        }
        return system, params, batch

    def test_bf16_disc_matches_f32_loosely(self):
        """disc_compute_dtype=bf16 (the TPU default; reference trains under
        16-mixed) shifts losses only by rounding, and both sides still
        train."""
        system, params, batch = self._setup()

        def run(dtype):
            system.disc_compute_dtype = dtype
            system._jit_loss = {}  # drop traces cached with the old dtype
            trainer = MixerTrainer(system, lr=1e-3, grad_acc_steps=1)
            state = trainer.init_state(params)
            s1, g, d = trainer.fit_step(state, batch, jax.random.PRNGKey(2), 0)
            return s1, float(g["total"]), float(d["total"])

        try:
            _, g32, d32 = run(None)
            s1, g16, d16 = run(jnp.bfloat16)
        finally:
            system.disc_compute_dtype = None
        assert np.isfinite(g16) and np.isfinite(d16)
        assert abs(g16 - g32) <= 0.05 * max(1.0, abs(g32))
        assert abs(d16 - d32) <= 0.05 * max(1.0, abs(d32))
        # G gradients flow through the bf16 disc back into the mixer core.
        diff = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(s1.params["core"]),
                jax.tree_util.tree_leaves(params["core"]),
            )
        )
        assert diff > 0

    def test_remat_toggle_grads_match(self):
        """set_remat_scan(False) changes scheduling, not math: same losses
        and same updates."""
        from mixermdm_tpu.models.layers import remat_scan_enabled, set_remat_scan

        system, params, batch = self._setup()

        def run():
            trainer = MixerTrainer(system, lr=1e-3, grad_acc_steps=1)
            state = trainer.init_state(params)
            s1, g, d = trainer.fit_step(state, batch, jax.random.PRNGKey(2), 0)
            return s1, float(g["total"]), float(d["total"])

        assert remat_scan_enabled()
        s_on, g_on, d_on = run()
        set_remat_scan(False)
        try:
            s_off, g_off, d_off = run()
        finally:
            set_remat_scan(True)
        assert np.isclose(g_on, g_off, rtol=1e-5)
        assert np.isclose(d_on, d_off, rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_on.params["core"]),
            jax.tree_util.tree_leaves(s_off.params["core"]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


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


class TestScheduleSamplerWiring:
    """VERDICT item 5: SAMPLER config reaches the trainer (loss-aware history
    updates per step) and cosine warmup drives the lr."""

    def _make(self, sampler):
        sys_ = In2INSystem(
            tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8),
            mode="individual", clip_cfg=ClipTextConfig.tiny(),
        )
        params = sys_.init_params(jax.random.PRNGKey(0))
        trainer = BaseTrainer(sys_, lr=1e-3, sampler=sampler)
        return sys_, trainer, trainer.init_state(params)

    def _batch(self, sys_, B=4, T=12):
        ctx = sys_.text.clip_cfg.context_length
        return {
            "motions": jax.random.normal(jax.random.PRNGKey(1), (B, T, 262)) * 0.3,
            "motion_lens": jnp.asarray([T] * B),
            "tokens": jnp.zeros((B, ctx), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407),
        }

    def test_loss_aware_history_updates(self):
        sys_, trainer, state = self._make("loss-second-moment")
        assert state.sampler_state is not None
        batch = self._batch(sys_)
        for i in range(3):
            state, losses = trainer.step(state, batch, jax.random.PRNGKey(10 + i))
        # 3 steps x batch 4 = 12 inserts over 8 timesteps.
        assert int(np.asarray(state.sampler_state.counts).sum()) == 12
        assert float(np.abs(np.asarray(state.sampler_state.history)).sum()) > 0

    def test_sampler_from_system_config(self):
        cfg = tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8)
        cfg["SAMPLER"] = "loss-second-moment"
        sys_ = In2INSystem(cfg, mode="individual", clip_cfg=ClipTextConfig.tiny())
        trainer = BaseTrainer(sys_, lr=1e-3)
        assert trainer.sampler_name == "loss-second-moment"
        state = trainer.init_state(sys_.init_params(jax.random.PRNGKey(0)))
        assert state.sampler_state is not None

    def test_mixer_system_honors_sampler_config(self):
        """MixerMDMSystem draws t via the SAMPLER config (reference
        mixermdm.py:128-129,450), not an inline uniform randint."""
        from tests.test_systems import tiny_mixer

        sys_ = tiny_mixer(sampler="loss-second-moment")
        assert sys_._sampler_state0 is not None  # loss-aware history allocated
        sys_u = tiny_mixer()
        assert sys_u._sampler_state0 is None     # uniform: trivial state

    def test_frozen_fused_denoisers_grads_match(self):
        """Training with the fused (VJP-less) kernels enabled for the FROZEN
        denoisers must produce the same G/D gradients as the all-XLA path —
        no gradients flow through the frozen submodels (their conds are
        stop-gradiented), so the missing VJPs are never needed."""
        import mixermdm_tpu.ops.attention as A
        import mixermdm_tpu.ops.fused_block as FB
        from mixermdm_tpu.config import Config, tiny_config
        from mixermdm_tpu.models import layers as L
        from mixermdm_tpu.systems import In2INSystem, MixerMDMSystem
        from mixermdm_tpu.train.trainer import MixerTrainer

        # Denoisers at E=128 so the fused path is eligible (E % 128 == 0);
        # bf16 compute so the dtype gate passes on the CPU backend.
        base = tiny_config(latent=128, layers=1, heads=2, diffusion_steps=8)
        m1 = In2INSystem(base, mode="individual", clip_cfg=ClipTextConfig.tiny())
        m2 = In2INSystem(base, mode="interaction", clip_cfg=ClipTextConfig.tiny())
        mcfg = Config.wrap({
            "NAME": "MixerMDM",
            "GENERATOR": {"NUM_LAYERS": 1, "NUM_HEADS": 2, "DROPOUT": 0.0,
                          "INPUT_DIM": 262, "LATENT_DIM": 32, "FF_SIZE": 64},
            "DISCRIMINATOR": {"NUM_LAYERS": 1, "NUM_HEADS": 2, "DROPOUT": 0.0,
                              "INPUT_DIM": 262, "LATENT_DIM": 32, "FF_SIZE": 64},
            "DIFFUSION_STEPS": 8, "BETA_SCHEDULER": "cosine", "SAMPLER": "uniform",
            "MOTION_REP": "global", "T_BAR": 4, "STRATEGY": "ddim4",
            "CFG_WEIGHT": 3.5, "MIXING_MODE": 4, "FORCE_INFLUENCE_VAL": None,
        })
        sys_ = MixerMDMSystem(mcfg, model1=m1, model2=m2,
                              clip_cfg=ClipTextConfig.tiny(),
                              compute_dtype="bf16")
        params = sys_.init_params(jax.random.PRNGKey(0))
        # Zero-init output layers give zero adversarial grads — perturb.
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef,
            [l + 0.03 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)],
        )
        B, T = 2, 12
        ctx = sys_.text.clip_cfg.context_length
        batch = {
            "motions": jax.random.normal(jax.random.PRNGKey(1), (B, T, 524)) * 0.1,
            "motion_lens": jnp.asarray([T, T - 2]),
            "tokens_inter": jnp.zeros((B, ctx), jnp.int32),
            "tokens_i1": jnp.zeros((B, ctx), jnp.int32),
            "tokens_i2": jnp.zeros((B, ctx), jnp.int32),
        }

        def grads(mode):
            trainer = MixerTrainer(sys_, grad_acc_steps=1, lr=1e-3)
            state = trainer.init_state(params)
            step = (trainer.generator_step if mode == "generator"
                    else trainer.discriminator_step)
            new_state, _ = step(state, batch, jax.random.PRNGKey(5))
            return jax.tree_util.tree_map(
                lambda a, b: np.asarray(b, np.float32) - np.asarray(a, np.float32),
                state.params, new_state.params,
            )

        class _NoScope:
            def __init__(self, *a, **k):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

        old_a, old_fb = A.FORCE_INTERPRET, FB.FORCE_INTERPRET
        old_scope = L.fused_scope
        # use_pallas_attention() is False on CPU; force the fused path inside
        # the frozen scopes via interpret-mode kernels.
        A.FORCE_INTERPRET = FB.FORCE_INTERPRET = True
        old_auto = L.use_pallas_attention
        try:
            L.use_pallas_attention = lambda: L._PALLAS_ATTENTION is not False
            updates_fused = {m: grads(m) for m in ("generator", "discriminator")}
            L.fused_scope = _NoScope          # baseline: scopes disabled
            L.use_pallas_attention = old_auto  # pure-XLA everywhere
            updates_xla = {m: grads(m) for m in ("generator", "discriminator")}
        finally:
            A.FORCE_INTERPRET, FB.FORCE_INTERPRET = old_a, old_fb
            L.fused_scope = old_scope
            L.use_pallas_attention = old_auto

        for mode in ("generator", "discriminator"):
            fl, _ = jax.tree_util.tree_flatten(updates_fused[mode])
            xl, _ = jax.tree_util.tree_flatten(updates_xla[mode])
            total = sum(float(np.abs(x).sum()) for x in xl)
            assert total > 0, f"{mode}: no parameter movement"
            for f, x in zip(fl, xl):
                np.testing.assert_allclose(
                    f, x, atol=2e-2, rtol=2e-2,
                    err_msg=f"{mode} grads diverge between fused-frozen and XLA",
                )

    def test_clip_tower_excluded_from_optimizer(self):
        """The frozen CLIP tower must not be in the optimizer: the reference
        generator optimizer lists only the post-encoders (mixermdm.py /
        scripts/train/mixermdm.py:67-71), and AdamW weight decay would
        otherwise erode frozen weights with zero gradients."""
        cfg = tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8)
        sys_ = In2INSystem(cfg, mode="interaction", clip_cfg=ClipTextConfig.tiny())
        trainer = BaseTrainer(sys_, lr=1e-2, weight_decay=0.1)
        params = sys_.init_params(jax.random.PRNGKey(0))
        state = trainer.init_state(params)
        tower_before = jax.tree_util.tree_map(np.asarray, params["text"]["clip"])

        B, T = 2, 12
        ctx = sys_.text.clip_cfg.context_length
        batch = {
            "motions": jax.random.normal(jax.random.PRNGKey(1), (B, T, 524)) * 0.1,
            "motion_lens": jnp.asarray([T, T]),
            "tokens": jnp.zeros((B, ctx), jnp.int32),
            "tokens_i1": jnp.zeros((B, ctx), jnp.int32),
            "tokens_i2": jnp.zeros((B, ctx), jnp.int32),
        }
        for i in range(2):
            state, _ = trainer.step(state, batch, jax.random.PRNGKey(5 + i))
        tower_after = state.params["text"]["clip"]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
            tower_before, tower_after,
        )
        # ...while the trainable post-encoder head DID move.
        head = [k for k in state.params["text"] if k.startswith("post_")][0]
        moved = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).sum()),
            params["text"][head], state.params["text"][head],
        )
        assert sum(jax.tree_util.tree_leaves(moved)) > 0

    def test_cosine_warmup_schedule_drives_lr(self):
        from mixermdm_tpu.train.optim import cosine_warmup_schedule

        sched = cosine_warmup_schedule(1.0, warmup=10, max_iters=100)
        import jax.numpy as jnp2

        v0 = float(sched(jnp2.asarray(0)))
        v9 = float(sched(jnp2.asarray(9)))
        v50 = float(sched(jnp2.asarray(50)))
        v99 = float(sched(jnp2.asarray(99)))
        assert v0 < v9 <= 1.0          # warmup ramps up
        assert 0.4 < v50 < 0.6         # half-way cosine
        assert v99 < 0.01              # decays to ~0

        sys_ = In2INSystem(
            tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8),
            mode="individual", clip_cfg=ClipTextConfig.tiny(),
        )
        params = sys_.init_params(jax.random.PRNGKey(0))
        trainer = BaseTrainer(sys_, lr=1e-3, lr_schedule=sched)
        state = trainer.init_state(params)
        state, _ = trainer.step(state, self._batch(sys_), jax.random.PRNGKey(5))
        assert int(state.step) == 1  # schedule-driven optimizer steps fine


class TestFullStateResume:
    """VERDICT item 5: resumed run is bitwise-continuous with an unbroken one
    (reference Lightning ckpt_path, scripts/train/mixermdm.py:340-343)."""

    def test_mixer_resume_bitwise(self, tmp_path):
        import sys as _s, os

        _s.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from __graft_entry__ import _tiny_system

        from mixermdm_tpu.train.checkpoint import (
            restore_train_state,
            save_train_state,
        )

        system = _tiny_system()
        params = system.init_params(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(7), x.shape), params
        )
        trainer = MixerTrainer(system, lr=1e-3, grad_acc_steps=2)
        B, T = 2, 12
        ctx = system.text.clip_cfg.context_length
        tok = jnp.zeros((B, ctx), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407)
        batch = {
            "motions": jax.random.normal(jax.random.PRNGKey(1), (B, T, 524)) * 0.1,
            "motion_lens": jnp.asarray([T - 2, T - 4]),
            "tokens_inter": tok, "tokens_i1": tok, "tokens_i2": tok,
        }
        rngs = [jax.random.PRNGKey(100 + i) for i in range(4)]

        # Unbroken: 4 steps (grad_acc 2 means optimizer state matters at 2).
        state = trainer.init_state(params)
        for i in range(4):
            state, _, _ = trainer.fit_step(state, batch, rngs[i], i)

        # Broken: 2 steps, save FULL state, restore into a fresh trainer.
        state_b = trainer.init_state(params)
        for i in range(2):
            state_b, _, _ = trainer.fit_step(state_b, batch, rngs[i], i)
        save_train_state(str(tmp_path / "state"), state_b)

        trainer2 = MixerTrainer(system, lr=1e-3, grad_acc_steps=2)
        state_c = trainer2.init_state(params)
        state_c = restore_train_state(str(tmp_path / "state"), state_c)
        assert int(state_c.step) == int(state_b.step)
        for i in range(2, 4):
            state_c, _, _ = trainer2.fit_step(state_c, batch, rngs[i], i)

        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(state_c.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
