"""Training observability: running-mean console logs + JSONL metric sink.

Replaces the reference's wandb + ``print_current_loss`` logging
(``/root/reference/src/scripts/train/mixermdm.py:209-249``,
``src/utils/utils.py:164-188``) with a dependency-free logger: running means
flushed every ``log_every`` steps to stdout and appended as JSON lines for
offline dashboards.  ``jax.profiler`` trace capture hooks included for the
perf workflow the reference lacks entirely (SURVEY.md §5: tracing = none).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Optional


class MetricLogger:
    def __init__(self, log_every: int = 25, jsonl_path: Optional[str] = None):
        self.log_every = log_every
        self.jsonl_path = jsonl_path
        self._sums: dict = defaultdict(float)
        self._counts: dict = defaultdict(int)
        self._start = time.time()

    def log(self, step: int, epoch: int, metrics: dict) -> None:
        for k, v in metrics.items():
            self._sums[k] += float(v)
            self._counts[k] += 1
        if step % self.log_every == 0:
            means = {k: self._sums[k] / max(1, self._counts[k]) for k in self._sums}
            elapsed = time.time() - self._start
            msg = " ".join(f"{k}: {v:.4f}" for k, v in means.items())
            print(f"[{elapsed:7.1f}s] epoch {epoch:3d} step {step:6d} {msg}")
            if self.jsonl_path:
                os.makedirs(os.path.dirname(self.jsonl_path) or ".", exist_ok=True)
                with open(self.jsonl_path, "a") as f:
                    f.write(json.dumps({"step": step, "epoch": epoch, **means}) + "\n")
            self._sums.clear()
            self._counts.clear()


class WandbLogger:
    """wandb adapter matching the reference's ``WandbLogger`` usage
    (scripts/train/mixermdm.py:326 etc.): logs to wandb when the package is
    installed AND ``WANDB_API_KEY``/offline mode is configured; otherwise
    degrades to a no-op so training never depends on network access.
    Compose with :class:`MetricLogger` for the console/JSONL side."""

    def __init__(self, project: str, name: Optional[str] = None, config=None):
        self._run = None
        try:
            import wandb  # noqa: F401  (optional dependency, gated)

            self._run = wandb.init(project=project, name=name,
                                   config=dict(config or {}))
        except Exception:
            pass  # package missing / no credentials: stay silent, stay no-op

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, step: int, epoch: int, metrics: dict) -> None:
        if self._run is not None:
            self._run.log({"epoch": epoch, **metrics}, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()


class ProfilerSession:
    """Context manager capturing a jax.profiler trace for TensorBoard."""

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False


def step_timer(fn):
    """Decorator returning (result, seconds) with device sync."""

    def wrapped(*args, **kwargs):
        import jax

        start = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        return out, time.perf_counter() - start

    return wrapped
