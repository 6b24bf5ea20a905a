"""Native C++ feature pipeline vs the numpy reference implementation."""

import numpy as np
import pytest

from mixermdm_tpu.data.native import native_available, process_motion_interhuman_native
from mixermdm_tpu.utils.features import process_motion_interhuman


def raw_motion(T=30, seed=0):
    """Reduced-layout motion (22*3 pos + 21*6 rot), as load_motion emits."""
    rng = np.random.default_rng(seed)
    pos = rng.standard_normal((T, 22, 3)).astype(np.float32) * 0.1
    pos[..., 1] += 1.0
    rot = rng.standard_normal((T, 21 * 6)).astype(np.float32)
    return np.concatenate([pos.reshape(T, -1), rot], axis=1)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNativePipeline:
    def test_matches_numpy(self):
        m = raw_motion()
        feats_np, quat_np, pos_np = process_motion_interhuman(
            m.astype(np.float64), 0.001, 0, 22
        )
        feats_cc, quat_cc, pos_cc = process_motion_interhuman_native(m, 0.001, 0)
        assert feats_cc.shape == feats_np.shape == (29, 262)
        np.testing.assert_allclose(feats_cc, feats_np, atol=2e-5)
        np.testing.assert_allclose(np.abs(quat_cc), np.abs(quat_np), atol=1e-5)
        np.testing.assert_allclose(pos_cc, pos_np, atol=1e-5)

    def test_prev_frames_offset(self):
        m = raw_motion(seed=1)
        feats_np, _, _ = process_motion_interhuman(m.astype(np.float64), 0.001, 3, 22)
        feats_cc, _, _ = process_motion_interhuman_native(m, 0.001, 3)
        np.testing.assert_allclose(feats_cc, feats_np, atol=2e-5)

    def test_contacts_binary(self):
        feats, _, _ = process_motion_interhuman_native(raw_motion(seed=2), 0.001, 0)
        contacts = feats[:, 258:]
        assert set(np.unique(contacts)).issubset({0.0, 1.0})


def test_fallback_works_without_native(monkeypatch):
    import mixermdm_tpu.data.native as N

    monkeypatch.setattr(N, "get_lib", lambda: None)
    m = raw_motion(seed=3)
    feats, quat, pos = N.process_motion_interhuman_native(m, 0.001, 0)
    assert feats.shape == (29, 262)
