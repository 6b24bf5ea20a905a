"""Influence-plot parity: the plotted arrays match the reference's recovery
and reduction semantics (reference plot.py:134-352)."""

import numpy as np
import pytest

from mixermdm_tpu.utils.plot import (
    influence_joint_weights,
    influence_surfaces,
    plot_influence,
)


def _history(S=5, B=2, T=7):
    rng = np.random.default_rng(0)
    # Expanded (262) history built from known 23 joint weights, using the
    # expansion layout (22 joints x3 | 22 vels x3 | 21 rots x6 | contact x4).
    w23 = rng.random((S, B, T, 23)).astype(np.float32)
    j = np.repeat(w23[..., :22], 3, axis=-1)
    r = np.repeat(w23[..., :21], 6, axis=-1)
    f = np.repeat(w23[..., 22:23], 4, axis=-1)
    return np.concatenate([j, j, r, f], axis=-1), w23


class TestInfluenceSurfaces:
    def test_joint_weight_recovery(self):
        h, w23 = _history()
        rec = influence_joint_weights(h)
        # 22 joint weights recover exactly.
        np.testing.assert_allclose(rec[..., :22], w23[..., :22], rtol=1e-6)
        # Dim 192 is the reference's contact read-back: 192-132=60 -> 6d
        # group 10 -> joint weight 10 (a faithful quirk of plot.py:218).
        np.testing.assert_allclose(rec[..., 22], w23[..., 10], rtol=1e-6)

    def test_mode4_surfaces(self):
        h, w23 = _history()
        s = influence_surfaces(h, 4)
        rec = influence_joint_weights(h)
        np.testing.assert_allclose(
            s["step_x_time"], rec[:, 0].mean(axis=-1), rtol=1e-6
        )
        np.testing.assert_allclose(
            s["step_x_joint"], rec[:, 0].mean(axis=-2), rtol=1e-6
        )
        assert s["step_x_time"].shape == (5, 7)
        assert s["step_x_joint"].shape == (5, 23)

    def test_mode3_and_2_and_1(self):
        h, _ = _history()
        assert influence_surfaces(h, 3)["step_x_joint"].shape == (5, 23)
        assert influence_surfaces(h, 2)["step_x_time"].shape == (5, 7)
        assert influence_surfaces(h, 1)["line"].shape == (5,)

    @pytest.mark.parametrize("mode", [1, 2, 3, 4])
    def test_pdf_written(self, mode, tmp_path):
        h, _ = _history()
        out = plot_influence(str(tmp_path / "x"), h, mixing_mode=mode)
        assert out.endswith(f"_influence{mode}.pdf")
        import os

        assert os.path.getsize(out) > 1000
