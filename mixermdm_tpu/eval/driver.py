"""Shared evaluation-protocol driver: batched generation + one dataset side.

Factored out of the MixerMDM eval CLI so the base-model evaluators
(in2IN / DualMDM / MDM — reference ``scripts/eval/interaction.py`` /
``individual.py``) run the exact same protocol code path over a different
generator.  A "system" here is anything exposing
``generate_cond(params, batch)`` and ``sample(params, cond, n_frames, rng)``
returning raw motion; :class:`BaseSystemAdapter` adapts the base systems'
``build_cond``/``text_process`` surfaces to that contract.
"""

from __future__ import annotations

from collections import OrderedDict, defaultdict


def interleave(t1, t2):
    """Per-person texts interleaved to match the 2B person batch
    (reference evaluation/utils.py:282-301)."""
    out = []
    for a, b in zip(t1, t2):
        out.extend([a, b])
    return out


def length_groups(idx_list, dataset, per_item: bool, batch_size: int):
    """Yield index batches; with per_item, group equal lengths so every item
    is generated at exactly its own length (protocol-exact)."""
    if not per_item:
        for start in range(0, len(idx_list), batch_size):
            yield idx_list[start : start + batch_size]
        return
    by_len = defaultdict(list)
    for i in idx_list:
        by_len[int(dataset[i]["motion_lens"])].append(i)
    for _, group in sorted(by_len.items()):
        for start in range(0, len(group), batch_size):
            yield group[start : start + batch_size]


class BaseSystemAdapter:
    """Base system (In2IN any mode / DualMDM / MDM) -> eval-driver contract.

    The reference's eval loaders call ``model.forward_test`` per item
    (evaluation/utils.py:46-88); here cond building and sampling stay
    batched and jitted.
    """

    def __init__(self, system):
        self.system = system

    def generate_cond(self, params, batch):
        if hasattr(self.system, "build_cond"):
            return self.system.build_cond(params, batch)
        return self.system.text_process(params, batch["text"])  # MDM

    def sample(self, params, cond, n_frames, rng, **kwargs):
        return self.system.sample(params, cond, n_frames, rng, **kwargs)

    def init_params(self, rng):
        return self.system.init_params(rng)


def generate_batches(system, params, dataset, rng, *, num_samples, batch_size,
                     per_item, mesh=None, sample_kwargs=None,
                     text_decomposer=None):
    """Batched generation over a GT set.

    Returns (gt_batches, gen_batches, ind_text_batches); every batch is
    ``(texts, motions(B,T,D), lens)``.

    ``text_decomposer`` (captions -> (t1_list, t2_list)) OVERRIDES the
    dataset's individual texts — the reference's ``llm=True`` behaviour
    (evaluation/datasets.py:71-96, the gpt-4o-mini splitter); ``None`` keeps
    the dataset texts with the identity fallback when absent.
    """
    import jax
    import numpy as np

    from ..data.loader import collate
    from .datasets import _sharded_sample

    gt_batches, gen_batches, ind_texts = [], [], []
    n = min(num_samples, len(dataset))
    for idx in length_groups(list(range(n)), dataset, per_item, batch_size):
        items = [dataset[i] for i in idx]
        batch = collate(items)
        if text_decomposer is not None:
            t1, t2 = text_decomposer(list(batch["text"]))
            batch["text_individual1"] = list(t1)
            batch["text_individual2"] = list(t2)
        elif "text_individual1" not in batch:
            batch["text_individual1"] = list(batch["text"])
            batch["text_individual2"] = list(batch["text"])
        gt_batches.append(
            (batch["text"], batch["motions"].astype(np.float32), batch["motion_lens"])
        )
        ind_texts.append((batch["text_individual1"], batch["text_individual2"]))

        rng, step = jax.random.split(rng)
        T = int(batch["motion_lens"].max())
        motions = _sharded_sample(
            system, params, system.generate_cond(params, batch), T, step, mesh,
            **(sample_kwargs or {}),
        )
        pad = batch["motions"].shape[1] - T
        if pad > 0:
            motions = np.pad(motions, ((0, 0), (0, pad), (0, 0)))
        gen_batches.append((batch["text"], motions, batch["motion_lens"]))
    return gt_batches, gen_batches, ind_texts


def run_side(system, params, gt_dataset, wrapper, protocol, *, individual,
             num_samples, batch_size, max_frames, replications, seed,
             per_item=False, mm_num_samples=None, mm_num_repeats=None,
             model_name="mixermdm", mesh=None, sample_kwargs=None,
             text_decomposer=None):
    """One dataset side of the protocol (reference ``evaluation()``,
    eval/mixermdm.py:124-213).  Returns {metric: {name: [per-replication]}}.

    ``individual=True`` interleaves the per-person texts to match the
    Individual wrapper's 2B person batch; single-person generators pass
    ``individual=False`` with the Individual wrapper (motions are already
    one person wide, the wrapper just centres them).
    """
    import jax
    import numpy as np

    from . import (
        evaluate_diversity,
        evaluate_fid,
        evaluate_matching_score,
        evaluate_multimodality,
    )
    from .datasets import MMGeneratedDataset

    mm_num_samples = protocol.mm_num_samples if mm_num_samples is None else mm_num_samples
    mm_num_repeats = protocol.mm_num_repeats if mm_num_repeats is None else mm_num_repeats

    all_metrics = defaultdict(lambda: defaultdict(list))
    for rep in range(replications):
        print(f"== replication {rep + 1}/{replications} ==")
        rng = jax.random.PRNGKey(seed + 1000 * rep)
        rng, gen_rng, mm_rng = jax.random.split(rng, 3)
        import time as _time

        _t0 = _time.perf_counter()
        gt_batches, gen_batches, ind_texts = generate_batches(
            system, params, gt_dataset, gen_rng,
            num_samples=num_samples, batch_size=batch_size,
            per_item=per_item, mesh=mesh, sample_kwargs=sample_kwargs,
            text_decomposer=text_decomposer,
        )
        # Generation dominates the protocol wall-clock and is the part that
        # shards over a data mesh — report it separately so multi-chip
        # wall-clock projects as gen/N + scoring.
        print(f"generation: {_time.perf_counter() - _t0:.1f}s "
              f"({sum(len(b[0]) for b in gen_batches)} items"
              f"{f', {mesh.devices.size}-device mesh' if mesh is not None else ''})")
        if individual:
            # The individual evaluator scores per-person halves against the
            # per-person texts (2B interleave, evaluation/utils.py:282-301).
            gen_batches = [
                (interleave(t1, t2), m, l)
                for (t1, t2), (_, m, l) in zip(ind_texts, gen_batches)
            ]
            gt_batches = [
                (interleave(t1, t2), m, l)
                for (t1, t2), (_, m, l) in zip(ind_texts, gt_batches)
            ]

        sets = OrderedDict(
            [(model_name, gen_batches), ("ground truth", gt_batches)]
        )
        _t0 = _time.perf_counter()
        match, rprec, acts = evaluate_matching_score(sets, wrapper, protocol.top_k)
        fid = evaluate_fid(gt_batches, {model_name: acts[model_name]}, wrapper)
        div_times = min(protocol.diversity_times, acts[model_name].shape[0] - 1)
        div = evaluate_diversity(acts, div_times, seed=seed + rep)
        print(f"scoring: {_time.perf_counter() - _t0:.1f}s "
              f"(InterCLIP embeddings + metric kernels"
              f"{f', {wrapper.mesh.devices.size}-device mesh' if getattr(wrapper, 'mesh', None) is not None else ''})")

        mm_val = None
        if mm_num_samples > 0:
            _t0 = _time.perf_counter()
            mm_set = MMGeneratedDataset(
                system, params, gt_dataset, mm_rng,
                mm_num_samples=mm_num_samples, mm_num_repeats=mm_num_repeats,
                max_frames=max_frames, mesh=mesh,
            )
            print(f"mm generation: {_time.perf_counter() - _t0:.1f}s "
                  f"({mm_num_samples}x{mm_num_repeats} items)")
            # times must stay below the replica count (metrics.py sampling);
            # only relevant for down-scaled --tiny runs (protocol: 15 > 5).
            mm_times = min(protocol.mm_num_times, mm_num_repeats - 1)
            mm = evaluate_multimodality(
                {model_name: list(mm_set)}, wrapper, mm_times,
                seed=seed + rep,
            )
            mm_val = float(mm[model_name])

        for name in sets:
            all_metrics["MM Distance"][name].append(float(match[name]))
            for k in range(protocol.top_k):
                all_metrics[f"R_precision_top{k + 1}"][name].append(
                    float(rprec[name][k])
                )
            all_metrics["Diversity"][name].append(float(div[name]))
        all_metrics["FID"][model_name].append(float(fid[model_name]))
        if mm_val is not None:
            all_metrics["MultiModality"][model_name].append(mm_val)
    return all_metrics


def collect_gt_batches(dataset, num_samples, batch_size):
    """GT (texts, motions, lens) batches with no generation."""
    import numpy as np

    from ..data.loader import collate

    out = []
    n = min(num_samples, len(dataset))
    for start in range(0, n, batch_size):
        items = [dataset[i] for i in range(start, min(start + batch_size, n))]
        batch = collate(items)
        out.append(
            (batch["text"], batch["motions"].astype(np.float32), batch["motion_lens"])
        )
    return out


def run_dualmdm_cross(system, params, gt_dataset, hml_dataset, wrapper,
                      protocol, *, sweep, num_samples, batch_size, max_frames,
                      replications, seed, mesh=None):
    """Cross-dataset composition comparison (reference
    evaluation/datasets.py:228-382): the mixer generates from InterHuman
    interaction texts crossed with random HumanML3D individual texts, once
    per ``force_influence_val`` in ``sweep`` (``None`` = learned influence,
    ``0.0`` = pure interaction model — the reference's base-vs-composed
    toggle, :297-323), and each variant is scored against the InterHuman GT
    under the interaction evaluator.
    """
    import jax

    from .datasets import EvaluationDatasetDualMDM
    from . import (
        evaluate_diversity,
        evaluate_fid,
        evaluate_matching_score,
    )

    def _name(v):
        return "learned_influence" if v is None else f"force_influence_{v:g}"

    all_metrics = defaultdict(lambda: defaultdict(list))
    for rep in range(replications):
        print(f"== dualmdm-cross replication {rep + 1}/{replications} ==")
        rng = jax.random.PRNGKey(seed + 1000 * rep)
        gt_batches = collect_gt_batches(gt_dataset, num_samples, batch_size)
        sets = OrderedDict()
        for v in sweep:
            rng, r = jax.random.split(rng)
            ds = EvaluationDatasetDualMDM(
                system, params, gt_dataset, hml_dataset, r,
                force_influence_val=v, seed=seed + rep,
                num_samples=num_samples, batch_size=batch_size,
                max_frames=max_frames, mesh=mesh,
            )
            sets[_name(v)] = list(ds.batches(batch_size))
        sets["ground truth"] = gt_batches

        match, rprec, acts = evaluate_matching_score(sets, wrapper, protocol.top_k)
        gen_names = [_name(v) for v in sweep]
        fid = evaluate_fid(gt_batches, {n: acts[n] for n in gen_names}, wrapper)
        div_times = min(protocol.diversity_times,
                        min(acts[n].shape[0] for n in sets) - 1)
        div = evaluate_diversity(acts, div_times, seed=seed + rep)

        for name in sets:
            all_metrics["MM Distance"][name].append(float(match[name]))
            for k in range(protocol.top_k):
                all_metrics[f"R_precision_top{k + 1}"][name].append(
                    float(rprec[name][k])
                )
            all_metrics["Diversity"][name].append(float(div[name]))
        for name in gen_names:
            all_metrics["FID"][name].append(float(fid[name]))
    return all_metrics


def summarize_metrics(metrics, replications):
    import numpy as np

    from . import get_metric_statistics

    return {
        metric: {
            name: list(get_metric_statistics(np.asarray(v), replications))
            for name, v in d.items()
        }
        for metric, d in metrics.items()
    }


def clean_json(o):
    import numpy as np

    if isinstance(o, dict):
        return {k: clean_json(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [clean_json(v) for v in o]
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, (np.floating, np.integer)):
        return float(o)
    return o
