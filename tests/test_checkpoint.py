"""Checkpoint converter round-trips + orbax save/restore."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.models.in2in import In2INDenoiser
from mixermdm_tpu.train import checkpoint as ck


def tiny_denoiser(mode="interaction"):
    return In2INDenoiser(input_feats=262, mode=mode, latent_dim=32,
                         ff_size=64, num_layers=2, num_heads=2, text_dim=64)


class TestConverterRoundtrip:
    @pytest.mark.parametrize("mode", ["individual", "interaction"])
    def test_export_import_identity(self, mode):
        """flax -> torch-naming -> flax must be the identity, and the
        reloaded params must produce identical outputs."""
        d = tiny_denoiser(mode)
        two = 2 if mode != "individual" else 1
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 262 * two))
        cond_dim = 64 * (3 if mode == "interaction" else 1)
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, cond_dim))
        t = jnp.asarray([1, 3])
        params = d.init(jax.random.PRNGKey(2), x, t, None, cond)["params"]

        sd = ck.export_in2in_denoiser(params, prefix="net")
        back = ck.convert_in2in_denoiser(sd, "net", num_layers=2,
                                         has_cross=mode == "interaction")

        out1 = d.apply({"params": params}, x, t, None, cond)
        out2 = d.apply({"params": jax.tree_util.tree_map(jnp.asarray, back)},
                       x, t, None, cond)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    def test_export_uses_torch_key_names(self):
        d = tiny_denoiser("individual")
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 262))
        params = d.init(jax.random.PRNGKey(1), x, jnp.asarray([0]), None,
                        jnp.zeros((1, 64)))["params"]
        sd = ck.export_in2in_denoiser(params)
        assert "blocks.0.sa_block.attention.in_proj_weight" in sd
        assert "embed_timestep.time_embed.0.weight" in sd
        assert "out.linear.weight" in sd

    def test_dualmdm_merge(self):
        sd_inter = {
            "decoder.net_interaction.x": np.ones(1),
            "clipTransEncoder_interaction.y": np.ones(1),
        }
        sd_ind = {
            "decoder.net_individual.x": np.full(1, 2.0),
            "clipTransEncoder_individual.y": np.full(1, 3.0),
            "decoder.net_interaction.x": np.full(1, 9.0),  # must NOT override
        }
        merged = ck.merge_dualmdm_state_dicts(sd_inter, sd_ind)
        assert merged["decoder.net_interaction.x"][0] == 1.0
        assert merged["decoder.net_individual.x"][0] == 2.0
        assert merged["clipTransEncoder_individual.y"][0] == 3.0


class TestOrbax:
    def test_save_restore_roundtrip(self, tmp_path):
        params = {
            "a": {"kernel": jnp.arange(6.0).reshape(2, 3), "bias": jnp.zeros(3)},
            "b": jnp.ones((4,)),
        }
        path = str(tmp_path / "ckpt")
        ck.save_checkpoint(path, params)
        restored = ck.restore_checkpoint(path, params)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y)),
            params, restored,
        )
