"""Multi-device (virtual 8-CPU mesh) training-step tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.parallel.mesh import make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


class TestMesh:
    def test_shard_batch_places_on_data_axis(self, mesh):
        batch = {"x": np.zeros((8, 4, 2), np.float32), "l": np.zeros((8,), np.int32)}
        dev = shard_batch(batch, mesh)
        shard_shapes = {s.data.shape for s in dev["x"].addressable_shards}
        assert shard_shapes == {(1, 4, 2)}

    def test_replicated_params(self, mesh):
        p = {"w": np.ones((3, 3), np.float32)}
        dev = replicate(p, mesh)
        assert len(dev["w"].addressable_shards) == 8
        assert all(s.data.shape == (3, 3) for s in dev["w"].addressable_shards)


class TestMultiDeviceTraining:
    def test_graft_dryrun(self):
        """The driver's multichip dry run must pass on the 8-device mesh."""
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_mixer_sharded_sampling(self, mesh):
        """Data-parallel generation (the eval-at-scale path): replicated
        params + batch-sharded cond through the full DDIM chain."""
        from tests.test_systems import tiny_mixer

        sys_ = tiny_mixer()
        params = replicate(sys_.init_params(jax.random.PRNGKey(0)), mesh)
        B, T = 8, 12
        cond = shard_batch(
            {"c": np.random.default_rng(1).standard_normal(
                (B, 8 * sys_.text_dim)).astype(np.float32)},
            mesh,
        )["c"]
        out = sys_.sample(params, cond, T, jax.random.PRNGKey(2))
        assert out.shape == (B, T, 2 * sys_.nfeats)
        assert bool(jnp.isfinite(out).all())
        # The output stays sharded along the batch axis (no implicit gather).
        assert len({s.device for s in out.addressable_shards}) == 8

    def test_base_trainer_sharded_step(self, mesh):
        from mixermdm_tpu.config import tiny_config
        from mixermdm_tpu.models.clip_text import ClipTextConfig
        from mixermdm_tpu.systems import In2INSystem
        from mixermdm_tpu.train.trainer import BaseTrainer

        sys_ = In2INSystem(
            tiny_config(latent=32, layers=1, heads=2, diffusion_steps=8),
            mode="individual", clip_cfg=ClipTextConfig.tiny(),
        )
        params = sys_.init_params(jax.random.PRNGKey(0))
        trainer = BaseTrainer(sys_, mesh=mesh)
        state = trainer.init_state(params)
        state = state._replace(params=replicate(state.params, mesh))

        B, T = 8, 12
        ctx = sys_.text.clip_cfg.context_length
        batch = shard_batch(
            {
                "motions": np.random.default_rng(0).standard_normal((B, T, 262)).astype(np.float32),
                "motion_lens": np.asarray([T] * B),
                "tokens": np.zeros((B, ctx), np.int32),
            },
            mesh,
        )
        state2, losses = trainer.step(state, batch, jax.random.PRNGKey(1))
        assert bool(jnp.isfinite(losses["total"]))
        # Params changed and stayed replicated.
        w0 = jax.tree_util.tree_leaves(state.params)[0]
        w1 = jax.tree_util.tree_leaves(state2.params)[0]
        assert w0.shape == w1.shape
        assert int(state2.step) == 1
