"""Generation-time evaluation datasets.

Parity source ``/root/reference/src/evaluation/datasets.py``:
``EvaluationDatasetInterHuman``:17-184 (pre-generates model outputs over the
GT test set, with optional LLM decomposition of interaction texts into
individual texts), ``MMGeneratedDatasetInterHuman``:187-224 (multimodality
replicas), ``EvaluationDatasetDualMDM``:228-382 (interaction texts crossed
with random HumanML3D individual texts; toggles ``force_influence_val`` to
compare base vs composed models), plus the HumanML3D twins :385-546.

TPU re-design: generation is *batched* through the jitted sampling chain
(the reference loops the GT set at batch=1 — datasets.py:116); the LLM text
decomposition is an injectable callable (the reference hardcodes
langchain + OpenAI gpt-4o-mini, :32-96 — unavailable offline).  The default
decomposer is the identity "both persons do the interaction" fallback; a
real offline splitter lives in :mod:`mixermdm_tpu.eval.decompose`
(``heuristic_text_decomposer``, eval CLI ``--decompose heuristic``).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np


def default_text_decomposer(interaction_texts: List[str]):
    """Identity splitter: reuse the interaction text for both persons (what
    the reference's non-LLM path does implicitly).

    NOTE: this is no longer the default for MISSING individual texts — the
    measured corpus study (``scripts/decompose_corpus.py``,
    decompose_corpus.json: heuristic 95% subject accuracy / 86% fire-rate vs
    identity 12%/0%) wires ``decompose.heuristic_text_decomposer`` as the
    fallback instead.  This function remains the explicit
    ``--decompose identity`` choice."""
    return list(interaction_texts), list(interaction_texts)


def _fallback_decomposer(interaction_texts: List[str]):
    """Decomposer used when the dataset carries no individual texts: the
    measured winner (heuristic clause splitter) — see decompose_corpus.json."""
    from .decompose import heuristic_text_decomposer

    return heuristic_text_decomposer(interaction_texts)


def _sharded_sample(system, params, cond, T, rng, mesh, **kwargs):
    """Data-parallel generation: pad the cond batch to the mesh size, shard
    it over the ``data`` axis (params must already be replicated by the
    caller), sample, and drop the pad rows.  ``mesh=None`` = single device."""
    if mesh is None:
        return np.asarray(system.sample(params, cond, T, rng, **kwargs))
    import jax.numpy as jnp

    from ..parallel.mesh import data_sharded

    import jax

    B = cond.shape[0]
    ndev = mesh.devices.size
    pad = (-B) % ndev
    if pad:
        cond = jnp.concatenate([cond, jnp.repeat(cond[-1:], pad, axis=0)])
    cond = jax.device_put(cond, data_sharded(mesh))
    out = system.sample(params, cond, T, rng, **kwargs)
    return np.asarray(out)[:B]


class EvaluationDatasetInterHuman:
    """Generated-motion dataset over the InterHuman GT test set.

    ``system`` must expose ``generate_cond(params, batch)`` and
    ``sample(params, cond, n_frames, rng)``; generation runs in batches.
    """

    def __init__(
        self,
        system,
        params,
        gt_dataset,
        rng,
        num_samples: int = 250,
        batch_size: int = 32,
        max_frames: int = 300,
        text_decomposer: Optional[Callable] = None,
        force_influence_val: Optional[float] = None,
        mesh=None,
    ):
        import jax

        from ..data.loader import collate

        self.items: list = []
        n = min(num_samples, len(gt_dataset))
        decomposer = text_decomposer

        for start in range(0, n, batch_size):
            idx = range(start, min(start + batch_size, n))
            samples = [gt_dataset[i] for i in idx]
            batch = collate(samples)
            if decomposer is not None:
                t1, t2 = decomposer(batch["text"])
                batch["text_individual1"], batch["text_individual2"] = t1, t2
            elif "text_individual1" not in batch:
                t1, t2 = _fallback_decomposer(batch["text"])
                batch["text_individual1"], batch["text_individual2"] = t1, t2

            rng, step = jax.random.split(rng)
            T = int(np.max(batch["motion_lens"]))
            cond = system.generate_cond(params, batch)
            # fiv is a TRACED argument of system.sample — sweeping it re-uses
            # one compiled program (mutating system state was a staleness bug:
            # the value was baked into the jit trace and silently ignored on
            # shape-repeated sweeps).
            fiv_kwargs = (
                {"force_influence_val": force_influence_val}
                if force_influence_val is not None else {}
            )
            motions = _sharded_sample(
                system, params, cond, T, step, mesh, **fiv_kwargs
            )

            pad = max_frames - T
            if pad > 0:
                motions = np.pad(motions, ((0, 0), (0, pad), (0, 0)))
            for j, s in enumerate(samples):
                self.items.append(
                    {
                        "name": s["name"],
                        "text": s["text"],
                        "motions": motions[j],
                        "motion_lens": int(min(s["motion_lens"], T)),
                    }
                )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]

    def batches(self, batch_size: int):
        """Yield (texts, motions, lens) tuples for the metric drivers."""
        for start in range(0, len(self.items), batch_size):
            chunk = self.items[start : start + batch_size]
            yield (
                [c["text"] for c in chunk],
                np.stack([c["motions"] for c in chunk]),
                np.asarray([c["motion_lens"] for c in chunk]),
            )


class MMGeneratedDataset:
    """Per-prompt replica sets for multimodality (datasets.py:187-224).

    For ``mm_num_samples`` prompts, generates ``mm_num_repeats`` samples each
    — all replicas of one prompt in ONE batched call.
    """

    def __init__(
        self,
        system,
        params,
        gt_dataset,
        rng,
        mm_num_samples: int = 50,
        mm_num_repeats: int = 15,
        max_frames: int = 300,
        mesh=None,
    ):
        import jax

        from ..data.loader import collate

        self.replica_sets: list = []
        picks = np.random.default_rng(0).choice(
            len(gt_dataset), min(mm_num_samples, len(gt_dataset)), replace=False
        )
        for i in picks:
            s = gt_dataset[int(i)]
            batch = collate([s] * mm_num_repeats)
            if "text_individual1" not in batch:
                t1, t2 = _fallback_decomposer(batch["text"])
                batch["text_individual1"], batch["text_individual2"] = t1, t2
            rng, step = jax.random.split(rng)
            T = int(s["motion_lens"])
            cond = system.generate_cond(params, batch)
            motions = _sharded_sample(system, params, cond, T, step, mesh)
            pad = max_frames - T
            if pad > 0:
                motions = np.pad(motions, ((0, 0), (0, pad), (0, 0)))
            self.replica_sets.append(
                (motions, np.asarray([T] * mm_num_repeats))
            )

    def __len__(self):
        return len(self.replica_sets)

    def __getitem__(self, i):
        return self.replica_sets[i]


class EvaluationDatasetDualMDM(EvaluationDatasetInterHuman):
    """Cross-dataset composition eval (datasets.py:228-382): InterHuman
    interaction texts paired with *random HumanML3D individual texts*, with
    ``force_influence_val`` sweeps to compare base vs composed behaviour."""

    def __init__(
        self,
        system,
        params,
        gt_dataset,
        hml3d_dataset,
        rng,
        force_influence_val: Optional[float] = None,
        seed: int = 0,
        **kwargs,
    ):
        picker = np.random.default_rng(seed)

        def cross_decomposer(texts):
            n = len(texts)
            idx1 = picker.integers(0, len(hml3d_dataset), n)
            idx2 = picker.integers(0, len(hml3d_dataset), n)
            t1 = [hml3d_dataset[int(i)]["text"] for i in idx1]
            t2 = [hml3d_dataset[int(i)]["text"] for i in idx2]
            return t1, t2

        super().__init__(
            system, params, gt_dataset, rng,
            text_decomposer=cross_decomposer,
            force_influence_val=force_influence_val,
            **kwargs,
        )
