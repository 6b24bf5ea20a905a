"""Generation-time eval dataset tests (tiny system, synthetic GT)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.eval.datasets import (
    EvaluationDatasetDualMDM,
    EvaluationDatasetInterHuman,
    MMGeneratedDataset,
    default_text_decomposer,
)


class _FakeGT:
    """Minimal GT dataset: dict items like data.InterHumanDataset."""

    def __init__(self, n=5, T=12):
        rng = np.random.default_rng(0)
        self.items = [
            {
                "name": f"c{i}",
                "text": f"interaction {i}",
                "motion1": rng.standard_normal((T, 262)).astype(np.float32),
                "motion2": rng.standard_normal((T, 262)).astype(np.float32),
                "motion_lens": T - (i % 3),
                "text_individual1": f"p1 {i}",
                "text_individual2": f"p2 {i}",
            }
            for i in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.fixture(scope="module")
def tiny_system():
    import sys as _s, os

    _s.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _tiny_system

    system = _tiny_system()
    params = system.init_params(jax.random.PRNGKey(0))
    # Perturb the zero-init output layers so generated motions are nonzero
    # and depend on the sampling noise.
    params = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(5), x.shape), params
    )
    return system, params


class TestEvalDatasets:
    def test_generation_dataset(self, tiny_system):
        system, params = tiny_system
        ds = EvaluationDatasetInterHuman(
            system, params, _FakeGT(), jax.random.PRNGKey(1),
            num_samples=4, batch_size=2, max_frames=12,
        )
        assert len(ds) == 4
        item = ds[0]
        assert item["motions"].shape == (12, 524)
        batches = list(ds.batches(3))
        assert batches[0][1].shape == (3, 12, 524)

    def test_mm_replicas(self, tiny_system):
        system, params = tiny_system
        mm = MMGeneratedDataset(
            system, params, _FakeGT(), jax.random.PRNGKey(2),
            mm_num_samples=2, mm_num_repeats=3, max_frames=12,
        )
        assert len(mm) == 2
        motions, lens = mm[0]
        assert motions.shape[0] == 3  # replicas of one prompt
        # Same prompt, different noise -> replicas differ.
        assert float(np.abs(motions[0] - motions[1]).max()) > 1e-6

    def test_dualmdm_cross_texts(self, tiny_system):
        system, params = tiny_system

        class _FakeHML:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {"text": f"hml text {i}"}

        ds = EvaluationDatasetDualMDM(
            system, params, _FakeGT(n=2), _FakeHML(), jax.random.PRNGKey(3),
            num_samples=2, batch_size=2, max_frames=12,
        )
        assert len(ds) == 2

    def test_force_influence_restored(self, tiny_system):
        system, params = tiny_system
        before = system.force_influence_val
        EvaluationDatasetInterHuman(
            system, params, _FakeGT(n=2), jax.random.PRNGKey(4),
            num_samples=2, batch_size=2, max_frames=12, force_influence_val=1.0,
        )
        assert system.force_influence_val == before

    def test_force_influence_applied_after_none_trace(self, tiny_system):
        """Regression: fiv used to be baked into the jit trace (cache key was
        shapes only), so sweeps on an already-traced shape silently reused the
        fiv=None program.  Now fiv is a traced argument."""
        system, params = tiny_system
        from mixermdm_tpu.data.loader import collate

        gt = _FakeGT(n=2)
        batch = collate([gt[0], gt[1]])
        cond = system.generate_cond(params, batch)
        T = int(np.max(batch["motion_lens"]))
        rng = jax.random.PRNGKey(7)

        # Trace this shape first WITHOUT the override (the stale-trace setup).
        system.sample(params, cond, T, rng, collect_influence=True)

        # Same shape, override on: histories must be exactly the forced value.
        out_a, infl_a = system.sample(
            params, cond, T, rng, collect_influence=True, force_influence_val=0.25
        )
        assert np.allclose(np.asarray(infl_a[0]), 0.25)
        assert np.allclose(np.asarray(infl_a[1]), 0.25)

        # A different value through the SAME compiled program must take effect.
        out_b, infl_b = system.sample(
            params, cond, T, rng, collect_influence=True, force_influence_val=0.9
        )
        assert np.allclose(np.asarray(infl_b[0]), 0.9)
        assert float(np.abs(np.asarray(out_a) - np.asarray(out_b)).max()) > 1e-6

    def test_default_decomposer(self):
        t1, t2 = default_text_decomposer(["a", "b"])
        assert t1 == ["a", "b"] and t2 == ["a", "b"]
