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


class TestInterclipConverter:
    def test_structure_matches_init(self):
        """convert_interclip output must structurally match InterCLIP params."""
        import jax

        from mixermdm_tpu.config import Config
        from mixermdm_tpu.eval.interclip import InterCLIP

        cfg = Config.wrap(
            {"INPUT_DIM": 258, "LATENT_DIM": 32, "FF_SIZE": 64, "NUM_LAYERS": 1,
             "NUM_HEADS": 2, "DROPOUT": 0.0, "MODE": "interaction"}
        )
        model = InterCLIP(cfg, text_width=64)
        from mixermdm_tpu.models.torch_compat import TorchEncoder

        model.text_encoder = TorchEncoder(64, 2, 64, 1)
        params = jax.jit(model.init_params)(jax.random.PRNGKey(0))

        # Build a synthetic torch-keyed state dict with matching shapes by
        # exporting structure from our own params.
        sd = {}

        def mha_sd(p, prefix):
            E = np.asarray(p["q_proj"]["kernel"]).shape[0]
            w = np.concatenate([np.asarray(p[n]["kernel"]).T for n in
                                ("q_proj", "k_proj", "v_proj")], 0)
            b = np.concatenate([np.asarray(p[n]["bias"]) for n in
                                ("q_proj", "k_proj", "v_proj")], 0)
            sd[f"{prefix}.in_proj_weight"] = w
            sd[f"{prefix}.in_proj_bias"] = b
            sd[f"{prefix}.out_proj.weight"] = np.asarray(p["out_proj"]["kernel"]).T
            sd[f"{prefix}.out_proj.bias"] = np.asarray(p["out_proj"]["bias"])

        def encoder_sd(p, prefix, n_layers):
            from mixermdm_tpu.train.checkpoint import unstack_layer_tree

            for i, lp in enumerate(unstack_layer_tree(p["layers"]["layer"], n_layers)):
                mha_sd(lp["self_attn"], f"{prefix}.layers.{i}.self_attn")
                for lin in ("linear1", "linear2"):
                    sd[f"{prefix}.layers.{i}.{lin}.weight"] = np.asarray(lp[lin]["kernel"]).T
                    sd[f"{prefix}.layers.{i}.{lin}.bias"] = np.asarray(lp[lin]["bias"])
                for ln in ("norm1", "norm2"):
                    sd[f"{prefix}.layers.{i}.{ln}.weight"] = np.asarray(lp[ln]["scale"])
                    sd[f"{prefix}.layers.{i}.{ln}.bias"] = np.asarray(lp[ln]["bias"])

        me = params["motion_encoder"]
        sd["motion_encoder.query_token"] = np.asarray(me["query_token"])
        sd["motion_encoder.embed_motion.weight"] = np.asarray(me["embed_motion"]["kernel"]).T
        sd["motion_encoder.embed_motion.bias"] = np.asarray(me["embed_motion"]["bias"])
        encoder_sd(me["transformer"], "motion_encoder.transformer", 1)
        sd["motion_encoder.out_ln.weight"] = np.asarray(me["out_ln"]["scale"])
        sd["motion_encoder.out_ln.bias"] = np.asarray(me["out_ln"]["bias"])
        sd["motion_encoder.out.weight"] = np.asarray(me["out"]["kernel"]).T
        sd["motion_encoder.out.bias"] = np.asarray(me["out"]["bias"])
        sd["token_embedding.weight"] = np.asarray(params["token_embedding"])
        sd["positional_embedding"] = np.asarray(params["positional_embedding"])
        sd["latent_scale"] = np.asarray(params["latent_scale"])
        encoder_sd(params["text_encoder"], "textTransEncoder", 1)
        sd["text_ln.weight"] = np.asarray(params["text_ln"]["scale"])
        sd["text_ln.bias"] = np.asarray(params["text_ln"]["bias"])
        sd["out.weight"] = np.asarray(params["text_out"]["kernel"]).T
        sd["out.bias"] = np.asarray(params["text_out"]["bias"])

        back = ck.convert_interclip(sd, num_layers=1, text_layers=1)

        # Converted params give identical embeddings.
        motions = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 524))
        lens = jnp.asarray([8, 6])
        a = model.encode_motion(params, motions, lens)
        b = model.encode_motion(jax.tree_util.tree_map(jnp.asarray, back), motions, lens)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestAutoResume:
    def test_latest_train_state_path(self, tmp_path):
        from mixermdm_tpu.train.checkpoint import latest_train_state_path

        assert latest_train_state_path(str(tmp_path)) is None
        (tmp_path / "epoch_2_state").mkdir()
        (tmp_path / "epoch_10_state").mkdir()
        assert latest_train_state_path(str(tmp_path)).endswith("epoch_10_state")
        (tmp_path / "final_state").mkdir()
        assert latest_train_state_path(str(tmp_path)).endswith("final_state")
