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

    def test_pair_matches_per_stage_path(self):
        """Fused pair call == canonicalise x2 + Python relative rigid
        transform + pad (the dataset's fallback path, interhuman.py:208-216)."""
        from mixermdm_tpu.data.native import process_pair_interhuman_native
        from mixermdm_tpu.utils.features import _qrot_np, rigid_transform

        m1r, m2r = raw_motion(T=40, seed=4), raw_motion(T=40, seed=5)
        o1, o2, L = process_pair_interhuman_native(m1r, m2r, 0.001, 0, 50)
        assert (o1.shape, o2.shape, L) == ((50, 262), (50, 262), 39)
        assert (o1[39:] == 0).all() and (o2[39:] == 0).all()

        f1, q1, p1 = process_motion_interhuman_native(m1r, 0.001, 0)
        f2, q2, p2 = process_motion_interhuman_native(m2r, 0.001, 0)

        def qmul_np(q, r):
            w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
            w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
            return np.stack(
                [w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                 w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                 w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                 w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], axis=-1)

        r_rel = qmul_np(q2, q1 * np.array([1.0, -1.0, -1.0, -1.0]))
        angle = np.arctan2(r_rel[:, 2:3], r_rel[:, 0:1])
        xz = _qrot_np(q1, p2 - p1)[:, [0, 2]]
        f2t = rigid_transform(np.concatenate([angle, xz], axis=-1)[0], f2)
        np.testing.assert_allclose(o1[:39], f1, atol=1e-6)
        np.testing.assert_allclose(o2[:39], f2t.astype(np.float32), atol=1e-5)

    def test_dataset_native_vs_fallback(self):
        """End-to-end: dataset items identical (tolerance) with and without
        the native library, same augmentation seed."""
        import random

        import mixermdm_tpu.data.native as N
        from mixermdm_tpu.data import InterHumanDataset, make_interhuman_fixture

        root = "/tmp/native_ds_parity"
        make_interhuman_fixture(root, n_clips=3, n_frames=64)
        a = InterHumanDataset(root, mode="train", rng=random.Random(7))[1]
        prev = (N._LIB, N._TRIED)
        N._LIB, N._TRIED = None, True
        try:
            b = InterHumanDataset(root, mode="train", rng=random.Random(7))[1]
        finally:
            N._LIB, N._TRIED = prev
        assert a["motion_lens"] == b["motion_lens"] and a["text"] == b["text"]
        np.testing.assert_allclose(a["motion1"], b["motion1"], atol=2e-5)
        np.testing.assert_allclose(a["motion2"], b["motion2"], atol=2e-4)


def test_fallback_works_without_native(monkeypatch):
    import mixermdm_tpu.data.native as N

    monkeypatch.setattr(N, "get_lib", lambda: None)
    m = raw_motion(seed=3)
    feats, quat, pos = N.process_motion_interhuman_native(m, 0.001, 0)
    assert feats.shape == (29, 262)
