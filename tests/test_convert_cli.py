"""``python -m mixermdm_tpu convert`` round trips (VERDICT r3 item 4).

Each test writes a torch ``.ckpt`` in the exact reference on-disk layout
(lightning ``state_dict`` + ``model.`` prefixes, reference key names via the
export_* inverse converters — whose orientation/naming parity vs LIVE torch
modules is covered by tests/test_reference_parity.py and
tests/test_torch_parity.py), runs the CLI, restores the produced orbax
checkpoint into a freshly initialised system, and asserts the params came
back bitwise — plus a short sampling-parity check on the in2in family.

Reference load-site surgeries covered: ``model.`` stripping
(scripts/infer/mixermdm.py:174-176), DualMDM dict merging (dualmdm.py:12-14),
individual->interaction renames (finetuned.py:185-188).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from mixermdm_tpu.cli.convert import deep_merge, main as convert_main
from mixermdm_tpu.train import checkpoint as ck


def to_np(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def lightning_save(sd: dict, path: str, prefix: str = "model."):
    """Write a lightning-style checkpoint: ``{"state_dict": {"model.<k>": t}}``."""
    torch.save(
        {"state_dict": {prefix + k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}},
        path,
    )


def assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    lb = {jax.tree_util.keystr(k): v for k, v in lb.items()}
    assert len(la) == len(lb)
    for k, v in la:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(lb[jax.tree_util.keystr(k)]),
            err_msg=jax.tree_util.keystr(k),
        )


class TestDeepMerge:
    def test_fills_and_reports(self):
        t = {"a": {"w": np.zeros((2, 2)), "b": np.zeros(3)}, "c": np.zeros(1)}
        filled = []
        out = deep_merge(t, {"a": {"w": np.ones((2, 2))}}, filled=filled)
        assert filled == ["/a/w"]
        assert out["a"]["w"][0, 0] == 1.0 and out["c"][0] == 0.0

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="shape mismatch"):
            deep_merge({"w": np.zeros((2, 2))}, {"w": np.zeros((3, 2))})

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            deep_merge({"w": np.zeros(2)}, {"nope": np.zeros(2)})


class TestConvertIn2IN:
    def test_roundtrip_and_sampling_parity(self, tmp_path):
        from mixermdm_tpu.cli.infer_in2in import build_system

        sys_a = build_system(tiny=True, mode="interaction")
        params = sys_a.init_params(jax.random.PRNGKey(7))
        sd = ck.export_in2in_system(to_np(params), "interaction")
        ckpt = str(tmp_path / "in2in.ckpt")
        lightning_save(sd, ckpt)

        out = str(tmp_path / "orbax_in2in")
        assert convert_main(["--family", "in2in", "--mode", "interaction",
                             "--tiny", "--strict", "--ckpt", ckpt,
                             "--out", out]) == 0

        sys_b = build_system(tiny=True, mode="interaction")
        restored = ck.restore_checkpoint(out, sys_b.init_params(jax.random.PRNGKey(0)))
        assert_trees_equal(restored, params)

        # Sampling parity: original params vs the CLI-converted checkpoint.
        B, T = 2, 12
        tok = np.zeros((B, sys_a.text.clip_cfg.context_length), np.int32)
        tok[:, 0], tok[:, 1] = 49406, 49407
        toks = {"tokens": tok, "tokens_i1": tok, "tokens_i2": tok}
        cond = sys_a.encode_cond_tokens(params, toks)
        cond2 = sys_b.encode_cond_tokens(restored, toks)
        out_a = sys_a.sample(params, cond, T, jax.random.PRNGKey(3))
        out_b = sys_b.sample(restored, cond2, T, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


class TestConvertDualMDM:
    def test_merge_roundtrip(self, tmp_path):
        from mixermdm_tpu.cli.infer_in2in import build_system

        sys_a = build_system(tiny=True, mode="dual")
        params = sys_a.init_params(jax.random.PRNGKey(5))
        sd_full = ck.export_in2in_system(to_np(params), "dual")
        sd_ind = {k: v for k, v in sd_full.items() if "individual" in k}
        sd_inter = {k: v for k, v in sd_full.items() if k not in sd_ind}
        p_inter, p_ind = str(tmp_path / "inter.ckpt"), str(tmp_path / "ind.ckpt")
        lightning_save(sd_inter, p_inter)
        lightning_save(sd_ind, p_ind)

        out = str(tmp_path / "orbax_dual")
        assert convert_main(["--family", "dualmdm", "--tiny", "--strict",
                             "--ckpt-interaction", p_inter,
                             "--ckpt-individual", p_ind, "--out", out]) == 0

        sys_b = build_system(tiny=True, mode="dual")
        restored = ck.restore_checkpoint(out, sys_b.init_params(jax.random.PRNGKey(0)))
        assert_trees_equal(restored, params)


class TestConvertMDM:
    def test_roundtrip(self, tmp_path):
        from mixermdm_tpu.cli.infer_mdm import build_system

        sys_a = build_system(tiny=True)
        params = sys_a.init_params(jax.random.PRNGKey(11))
        sd = ck.export_mdm_system(to_np(params))
        ckpt = str(tmp_path / "mdm.ckpt")
        lightning_save(sd, ckpt)

        out = str(tmp_path / "orbax_mdm")
        assert convert_main(["--family", "mdm", "--tiny", "--strict",
                             "--ckpt", ckpt, "--out", out]) == 0

        sys_b = build_system(tiny=True)
        restored = ck.restore_checkpoint(out, sys_b.init_params(jax.random.PRNGKey(0)))
        assert_trees_equal(restored, params)


class TestConvertMixerMDM:
    def test_three_checkpoint_assembly(self, tmp_path):
        from mixermdm_tpu.cli.infer_mixermdm import build_system

        sys_a = build_system(None, tiny=True)
        params = sys_a.init_params(jax.random.PRNGKey(13))
        np_params = to_np(params)

        p_mixer = str(tmp_path / "MixerMDM.ckpt")
        p_ind = str(tmp_path / "individual.ckpt")
        p_inter = str(tmp_path / "interaction.ckpt")
        lightning_save(ck.export_mixermdm_system(np_params), p_mixer)
        lightning_save(ck.export_in2in_system(np_params["model1"], "individual"), p_ind)
        lightning_save(ck.export_in2in_system(np_params["model2"], "interaction"), p_inter)

        out = str(tmp_path / "orbax_mixer")
        assert convert_main(["--family", "mixermdm", "--tiny", "--strict",
                             "--ckpt", p_mixer, "--ckpt-individual", p_ind,
                             "--ckpt-interaction", p_inter, "--out", out]) == 0

        sys_b = build_system(None, tiny=True)
        restored = ck.restore_checkpoint(out, sys_b.init_params(jax.random.PRNGKey(0)))
        assert_trees_equal(restored, params)


class TestConvertInterclip:
    def test_roundtrip(self, tmp_path):
        from mixermdm_tpu.config import Config
        from mixermdm_tpu.eval.interclip import InterCLIP
        from mixermdm_tpu.models.torch_compat import TorchEncoder

        icfg = Config.wrap(
            {"INPUT_DIM": 258, "LATENT_DIM": 32, "FF_SIZE": 64, "NUM_LAYERS": 1,
             "NUM_HEADS": 2, "DROPOUT": 0.0, "MODE": "interaction"}
        )
        model = InterCLIP(icfg, text_width=64)
        model.text_encoder = TorchEncoder(64, 2, 64, 1)
        params = jax.jit(model.init_params)(jax.random.PRNGKey(17))
        sd = ck.export_interclip(to_np(params))
        ckpt = str(tmp_path / "interclip.ckpt")
        # The evaluator ckpt has no ``model.`` prefixes (reference
        # evaluation/utils.py loads the raw module state dict).
        lightning_save(sd, ckpt, prefix="")

        out = str(tmp_path / "orbax_interclip")
        assert convert_main(["--family", "interclip", "--tiny", "--strict",
                             "--ckpt", ckpt, "--out", out]) == 0

        model_b = InterCLIP(icfg, text_width=64)
        model_b.text_encoder = TorchEncoder(64, 2, 64, 1)
        restored = ck.restore_checkpoint(
            out, jax.jit(model_b.init_params)(jax.random.PRNGKey(0)))
        assert_trees_equal(restored, params)

        motions = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 524))
        lens = jnp.asarray([8, 6])
        a = model.encode_motion(params, motions, lens)
        b = model_b.encode_motion(restored, motions, lens)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFinetuneRename:
    def test_individual_to_interaction_surgery(self, tmp_path):
        """--rename-individual-to-interaction = finetuned.py:185-188: an
        INDIVIDUAL-trained checkpoint warm-starts the INTERACTION model."""
        from mixermdm_tpu.cli.convert import rename_individual_to_interaction

        sd = {"decoder.net_individual.out.linear.weight": np.ones(1),
              "clipTransEncoder_individual.x": np.ones(1),
              "clip_ln_individual.weight": np.ones(1)}
        renamed = rename_individual_to_interaction(sd)
        assert "decoder.net_interaction.out.linear.weight" in renamed
        assert "clipTransEncoder_interaction.x" in renamed
        assert "clip_ln_interaction.weight" in renamed
