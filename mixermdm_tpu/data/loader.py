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


class _WorkerError:
    """Envelope carrying a worker-thread exception to the consumer thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class DataLoader:
    """Shuffling, batching, prefetching iterator over a random-access dataset.

    ``num_workers > 1`` builds batches in N threads with ORDER-preserving
    delivery: the batch sequence of an epoch is identical for any worker
    count (only the datasets' internal augmentation draw order may differ,
    since workers interleave draws from the shared RNG)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        transform: Optional[Callable[[dict], dict]] = None,
        num_workers: int = 1,
        reseed_dataset: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.transform = transform
        self.num_workers = max(1, num_workers)
        self.reseed_dataset = reseed_dataset
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Position the loader at ``epoch`` (elastic resume).

        Both the index shuffle and — when ``reseed_dataset`` draws are in
        play via :meth:`__iter__` — the dataset's augmentation RNG are pure
        functions of ``(seed, epoch)``, so a restarted process that calls
        ``set_epoch(E)`` replays epoch E bitwise identically to the original
        process that reached it by iterating.  The torch counterpart is
        ``DistributedSampler.set_epoch`` (reference trainers rely on
        Lightning to call it)."""
        self.epoch = int(epoch)

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
        if self.reseed_dataset and hasattr(self.dataset, "rng"):
            # Augmentation draws (text choice / crop / swap) become a pure
            # function of (seed, epoch, fetch-order): with num_workers == 1
            # a resumed run that set_epoch()s to a checkpointed epoch replays
            # the SAME samples bitwise.  Multi-worker runs interleave draws
            # and keep only index-order determinism (docstring above).
            import random as _random

            self.dataset.rng = _random.Random((self.seed + 1) * 1_000_003
                                              + self.epoch)
        batches = self._index_batches()
        self.epoch += 1

        def make(b):
            batch = collate([self.dataset[int(i)] for i in b])
            if self.transform is not None:
                batch = self.transform(batch)
            return batch

        if self.num_workers == 1:
            # Worker exceptions (corrupt sample, transform error) are shipped
            # to the consumer and re-raised there — a dying daemon thread must
            # not leave the consumer blocked forever (ADVICE r2 low).
            def produce(q):
                try:
                    for b in batches:
                        q.put(make(b))
                    q.put(None)
                except BaseException as e:  # noqa: BLE001 — relayed, not swallowed
                    q.put(_WorkerError(e))

            q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
            t = threading.Thread(target=produce, args=(q,), daemon=True)
            t.start()
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, _WorkerError):
                    raise batch.exc
                yield batch
            return

        # Multi-worker: N threads build batches concurrently (numpy augment
        # + collate release the GIL for array ops); delivery stays in batch
        # order so epochs are deterministic regardless of worker count.
        task_q: queue.Queue = queue.Queue()
        done: dict[int, dict] = {}
        done_lock = threading.Lock()
        done_cv = threading.Condition(done_lock)
        for i, b in enumerate(batches):
            task_q.put((i, b))

        def worker():
            while True:
                try:
                    i, b = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = make(b)
                except BaseException as e:  # noqa: BLE001 — relayed to consumer
                    # Store the error at this slot so the consumer re-raises
                    # instead of waiting forever for an index that will never
                    # arrive (ADVICE r2 low).
                    with done_cv:
                        done[i] = _WorkerError(e)
                        done_cv.notify_all()
                    continue
                with done_cv:
                    # Bounded prefetch: don't run more than `prefetch`
                    # batches ahead of the consumer.
                    while i > self._next + max(1, self.prefetch):
                        done_cv.wait()
                    done[i] = batch
                    done_cv.notify_all()

        self._next = 0
        workers = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for w in workers:
            w.start()
        for i in range(len(batches)):
            with done_cv:
                while i not in done:
                    done_cv.wait()
                batch = done.pop(i)
                self._next = i + 1
                done_cv.notify_all()
            if isinstance(batch, _WorkerError):
                raise batch.exc
            yield batch
