"""Data-layer tests over synthetic fixtures in the reference layouts."""

import numpy as np
import pytest

from mixermdm_tpu.data import (
    DataLoader,
    HumanML3DDataset,
    InterHumanDataset,
    collate,
    make_hml3d_fixture,
    make_interhuman_fixture,
)


@pytest.fixture(scope="module")
def ih_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("interhuman")
    make_interhuman_fixture(str(root), n_clips=3, n_frames=40)
    return str(root)


@pytest.fixture(scope="module")
def hml_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("hml3d")
    make_hml3d_fixture(str(root), n_clips=3, n_frames=40)
    return str(root)


class TestInterHuman:
    def test_train_has_mirrored_copies(self, ih_root):
        ds = InterHumanDataset(ih_root, mode="train", max_gt_length=32)
        assert len(ds) == 6  # 3 clips x (orig + swap)
        names = [it["name"] for it in ds.items]
        assert any(n.endswith("_swap") for n in names)

    def test_item_contract(self, ih_root):
        ds = InterHumanDataset(ih_root, mode="train", max_gt_length=32)
        item = ds[0]
        assert item["motion1"].shape == (32, 262)
        assert item["motion2"].shape == (32, 262)
        assert 0 < item["motion_lens"] <= 32
        assert isinstance(item["text"], str) and item["text"]
        assert "text_individual1" in item
        # Padding zeros after the length.
        L = item["motion_lens"]
        if L < 32:
            np.testing.assert_allclose(item["motion1"][L:], 0.0)

    def test_canonicalisation(self, ih_root):
        """Person 1 starts at origin facing Z+ after processing."""
        ds = InterHumanDataset(ih_root, mode="test", max_gt_length=32)
        item = ds[0]
        root0 = item["motion1"][0, :3]
        assert abs(root0[0]) < 1e-4 and abs(root0[2]) < 1e-4

    def test_test_split_no_swap(self, ih_root):
        ds = InterHumanDataset(ih_root, mode="test", max_gt_length=32)
        assert all(not it["name"].endswith("_swap") for it in ds.items)


class TestHML3D:
    def test_item_contract(self, hml_root):
        ds = HumanML3DDataset(hml_root, mode="train", max_gt_length=32)
        assert len(ds) == 3
        item = ds[0]
        assert item["motion1"].shape == (32, 262)
        assert "#" not in item["text"]

    def test_extended_duplicates(self, hml_root):
        ds = HumanML3DDataset(hml_root, mode="train", extended=True, max_gt_length=32)
        item = ds[0]
        np.testing.assert_array_equal(item["motion1"], item["motion2"])
        assert item["text_individual1"] == item["text"]


class TestLoader:
    def test_batching_static_shapes(self, ih_root):
        ds = InterHumanDataset(ih_root, mode="train", max_gt_length=32)
        dl = DataLoader(ds, batch_size=2, seed=1)
        batches = list(dl)
        assert len(batches) == len(ds) // 2
        b = batches[0]
        assert b["motions"].shape == (2, 32, 524)
        assert len(b["text"]) == 2
        assert b["motion_lens"].shape == (2,)

    def test_epochs_reshuffle(self, ih_root):
        ds = InterHumanDataset(ih_root, mode="train", max_gt_length=32)
        dl = DataLoader(ds, batch_size=2, seed=1)
        names1 = [tuple(b["name"]) for b in dl]
        names2 = [tuple(b["name"]) for b in dl]
        assert names1 != names2  # different epoch order (overwhelmingly likely)

    def test_set_epoch_replays_bitwise(self, ih_root):
        """Elastic resume (VERDICT r4 #1): with reseed_dataset=True the data
        stream is a pure function of (seed, epoch) — a fresh loader that
        set_epoch()s to E replays epoch E of another loader bitwise,
        including the stateful augmentation draws (crop offsets, text
        choice, person swap)."""
        ds1 = InterHumanDataset(ih_root, mode="train", max_gt_length=32)
        dl1 = DataLoader(ds1, batch_size=2, seed=3, reseed_dataset=True)
        epochs1 = [list(dl1) for _ in range(3)]  # epochs 0, 1, 2

        ds2 = InterHumanDataset(ih_root, mode="train", max_gt_length=32)
        dl2 = DataLoader(ds2, batch_size=2, seed=3, reseed_dataset=True)
        dl2.set_epoch(2)  # "resumed process" jumping straight to epoch 2
        for b_orig, b_res in zip(epochs1[2], list(dl2)):
            assert tuple(b_orig["name"]) == tuple(b_res["name"])
            np.testing.assert_array_equal(b_orig["motions"], b_res["motions"])
            assert b_orig["text"] == b_res["text"]

    def test_without_reseed_epochs_still_reshuffle(self, ih_root):
        """reseed_dataset must not collapse epoch-to-epoch augmentation:
        consecutive epochs still differ (different epoch seed)."""
        ds = InterHumanDataset(ih_root, mode="train", max_gt_length=32)
        dl = DataLoader(ds, batch_size=2, seed=3, reseed_dataset=True)
        e0 = [tuple(b["name"]) for b in dl]
        e1 = [tuple(b["name"]) for b in dl]
        assert e0 != e1

    def test_worker_exception_propagates(self, ih_root):
        """A transform that raises must surface in the consumer instead of
        hanging the iterator (ADVICE r2 low: the error used to die with the
        daemon thread and the consumer blocked forever)."""
        ds = InterHumanDataset(ih_root, mode="train", max_gt_length=32)

        calls = {"n": 0}

        def bad_transform(batch):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("corrupt sample")
            return batch

        for workers in (1, 4):
            calls["n"] = 0
            dl = DataLoader(ds, batch_size=2, seed=7, num_workers=workers,
                            prefetch=1, transform=bad_transform)
            with pytest.raises(RuntimeError, match="corrupt sample"):
                list(dl)

    def test_native_loader_outruns_per_chip_consumption(self, tmp_path):
        """The native item pipeline must sustain at least the ~98 items/s one
        chip's training step consumes (BASELINE.md) — the fused C++ pair path
        measures ~1.5k items/s unloaded (loader_bench.json), so a 98/s floor
        holds even on a busy CI machine.  Skipped without a C++ toolchain."""
        import time

        from mixermdm_tpu.data import make_interhuman_fixture
        from mixermdm_tpu.data.native import native_available

        if not native_available():
            pytest.skip("no C++ toolchain")
        root = str(tmp_path / "loader_rate")
        make_interhuman_fixture(root, n_clips=16, n_frames=301)
        ds = InterHumanDataset(root, mode="train", cache=True)
        loader = DataLoader(ds, batch_size=16, num_workers=1, prefetch=2)
        for _ in loader:  # warm (thread spin-up, lazy imports)
            break
        items, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < 2.0:
            for b in loader:
                items += b["motions"].shape[0]
        rate = items / (time.perf_counter() - t0)
        assert rate >= 98.0, f"native loader sustains only {rate:.0f} items/s"

    def test_multiworker_order_matches_single(self, ih_root):
        """num_workers must not change batch order or content within an
        epoch (deterministic epochs regardless of parallelism)."""
        ds = InterHumanDataset(ih_root, mode="train", max_gt_length=32)
        dl1 = DataLoader(ds, batch_size=2, seed=7, num_workers=1)
        dl4 = DataLoader(ds, batch_size=2, seed=7, num_workers=4, prefetch=1)
        names1 = [tuple(b["name"]) for b in dl1]
        names4 = [tuple(b["name"]) for b in dl4]
        assert names1 == names4
        assert len(names1) == len(ds) // 2
