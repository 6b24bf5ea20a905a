"""CLI smoke tests (tiny configs, synthetic data, CPU backend)."""

import json
import os

import pytest


class TestCLISmoke:
    def test_train_mixermdm_tiny(self, tmp_path):
        from mixermdm_tpu.cli.train_mixermdm import main

        out = str(tmp_path / "mixer")
        main(["--tiny", "--out-dir", out, "--max-steps", "1"])
        assert os.path.isdir(os.path.join(out, "final"))

    def test_infer_mixermdm_tiny(self, tmp_path):
        import numpy as np

        from mixermdm_tpu.cli.infer_mixermdm import main

        out = str(tmp_path / "infer")
        main([
            "--tiny", "--name", "smoke", "--out-dir", out, "--num-samples", "2",
            "--text-interaction", "two people hug",
            "--text-individual1", "a person hugs",
            "--text-individual2", "a person hugs back",
        ])
        motion = np.load(os.path.join(out, "smoke_motion.npy"))
        assert motion.shape == (2, 16, 524)
        assert np.isfinite(motion).all()
        assert os.path.exists(os.path.join(out, "smoke_influence_i1.npy"))

    def test_eval_mixermdm_tiny(self, tmp_path):
        from mixermdm_tpu.cli.eval_mixermdm import main

        out = str(tmp_path / "eval.json")
        summary = main(["--tiny", "--replications", "1", "--out", out])
        # Full paper protocol: both dataset sides, all five metric families
        # (R-precision top-1/2/3 + MultiModality included), plus F-score.
        for side in ("interhuman", "hml3d"):
            assert side in summary
            for metric in ("MM Distance", "R_precision_top1", "R_precision_top2",
                           "R_precision_top3", "FID", "Diversity", "MultiModality"):
                assert metric in summary[side], (side, metric)
        assert "f_score" in summary and "FID" in summary["f_score"]
        with open(out) as f:
            loaded = json.load(f)
        assert "interhuman" in loaded

    def test_dispatcher_help(self, capsys):
        import mixermdm_tpu.__main__ as m
        import sys

        old = sys.argv
        sys.argv = ["mixermdm_tpu", "--help"]
        try:
            rc = m.main()
        finally:
            sys.argv = old
        assert rc == 0
        assert "infer-mixermdm" in capsys.readouterr().out


class TestShippedConfigs:
    def test_yaml_configs_build_full_system(self):
        """The shipped configs/ tree (reference schema) must parse and build
        the full-size system graph (no device compute)."""
        import os

        from mixermdm_tpu.cli.infer_mixermdm import build_system
        from mixermdm_tpu.config import get_config

        root = os.path.join(os.path.dirname(__file__), "..")
        for rel in ("configs/models/MixerMDM.yaml", "configs/models/in2IN.yaml",
                    "configs/models/individual.yaml", "configs/train/MixerMDM.yaml"):
            get_config(os.path.join(root, rel))
        os.chdir(root)  # MODEL1/MODEL2 paths are repo-relative
        system = build_system("configs/models/MixerMDM.yaml")
        assert float(system.cfg_weight) == 3.5
        assert system.quant_frozen is False
        assert int(system.cfg.GENERATOR.LATENT_DIM) == 512
