"""GPipe-style pipeline parallelism over stacked layer parameters.

The reference framework has no model parallelism of any kind (SURVEY.md
§2.9: Lightning DDP only), and the production denoisers (8 layers, ≤1024-d)
never *need* it — but a TPU-native framework's scaling story should not end
at data parallelism.  The denoiser stacks are already ``nn.scan``'ed with a
leading layer axis (``models/in2in.py`` ``_DoubleCondScanBody``), which is
exactly the parameter layout a pipeline schedule consumes: stage ``s`` of
``S`` owns the contiguous slice ``params[s*L/S:(s+1)*L/S]``.

``pipeline_scan`` is the drop-in pipeline replacement for the sequential

    carry, _ = lax.scan(lambda c, lp: (body(lp, c), None), carry, stacked)

It runs under ``shard_map`` over a ``pipe`` mesh axis with the classic
GPipe schedule: the batch splits into ``M`` microbatches, activations flow
stage-to-stage via ``lax.ppermute`` over ICI, and every device executes
``M + S - 1`` ticks (the ``S - 1`` bubble).  The whole schedule is a
``lax.fori_loop`` with static trip count, so it jits once and — because
``ppermute``/``shard_map``/``fori_loop`` are all differentiable — the SAME
primitive backpropagates, giving pipeline-parallel training with stashed
activations (plain GPipe; no 1F1B — the stacks here are 8 layers, the
bubble is irrelevant at this scale).

Numerical equality with the sequential scan (forward AND gradients) is
asserted on an 8-virtual-device CPU mesh in ``tests/test_parallel.py``.

Expert parallelism has no substrate in this model family (no MoE layers
anywhere in the reference — SURVEY.md §2), so the parallelism surface is
complete as dp (mesh.py) x tp (tp_shard_params) x sp (seq_constraint) x
fsdp (fsdp_shard_params) x pp (this module).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.6 exports shard_map at the top level (check_vma kwarg)
    from jax import shard_map as _shard_map  # type: ignore

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - version fallback
    from jax.experimental.shard_map import shard_map  # type: ignore

Pytree = Any


def _leading(tree: Pytree) -> int:
    return jax.tree_util.tree_leaves(tree)[0].shape[0]


# --------------------------------------------------------------------------
# Pipeline context: how the denoisers' layer stacks opt into pipelining.
#
# ``with pipeline_scope(mesh):`` makes every ``In2INDenoiser`` apply inside
# the block run its scanned layer stack through ``pipeline_scan`` instead of
# the sequential ``nn.scan`` (models/in2in.py:run_stack) — this is what the
# user-facing ``--pp`` CLI flags set.  Thread-local so CPU test meshes in
# worker threads can't leak into each other.
# --------------------------------------------------------------------------

_TLS = threading.local()


def pipeline_context():
    """The active ``(mesh, axis, n_microbatches)`` or ``None``."""
    return getattr(_TLS, "pipeline", None)


@contextlib.contextmanager
def pipeline_scope(mesh: Mesh, *, axis: str = "pipe",
                   n_microbatches: Optional[int] = None):
    prev = getattr(_TLS, "pipeline", None)
    _TLS.pipeline = (mesh, axis, n_microbatches)
    try:
        yield
    finally:
        _TLS.pipeline = prev


def pipeline_scan(
    body: Callable[[Pytree, Pytree], Pytree],
    stacked_params: Pytree,
    carry: Pytree,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    n_microbatches: Optional[int] = None,
) -> Pytree:
    """Apply ``L`` stacked layers to ``carry``, pipelined over ``mesh[axis]``.

    Args:
      body: ``body(layer_params, carry) -> carry`` — ONE layer. Must be pure
        (thread rngs through ``carry`` if needed).
      stacked_params: pytree whose leaves have a leading layer axis ``L``
        with ``L % n_stages == 0``.
      carry: activation pytree; every leaf has leading batch axis ``B`` with
        ``B % n_microbatches == 0``. Per-batch conditioning (embeddings,
        masks) rides inside ``carry`` so it microbatches consistently.
      mesh: mesh containing ``axis``; its size is the stage count ``S``.
      n_microbatches: defaults to ``S`` (the smallest count that fills the
        pipeline).

    Returns: the carry after all ``L`` layers — bitwise the same math as the
    sequential scan, replicated over ``axis``.
    """
    n_stages = mesh.shape[axis]
    n_layers = _leading(stacked_params)
    if n_layers % n_stages:
        raise ValueError(f"L={n_layers} layers not divisible by S={n_stages} stages")
    M = n_microbatches or n_stages
    B = _leading(carry)
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")

    mb = jax.tree_util.tree_map(
        lambda x: x.reshape((M, B // M) + x.shape[1:]), carry
    )

    def per_stage(local_params, mb):
        stage = jax.lax.axis_index(axis)
        last = n_stages - 1

        def run_local(c):
            def sb(c, lp):
                return body(lp, c), None

            c, _ = jax.lax.scan(sb, c, local_params)
            return c

        def tick(t, state):
            cur, outs = state
            # Stage 0 ingests a fresh microbatch each tick (clamped index:
            # past-the-end ticks feed garbage that never reaches `outs`);
            # later stages consume what the previous stage ppermuted in.
            take = jnp.clip(t, 0, M - 1)
            fresh = jax.tree_util.tree_map(lambda x: x[take], mb)
            x_in = jax.tree_util.tree_map(
                lambda f, c: jnp.where(stage == 0, f, c), fresh, cur
            )
            y = run_local(x_in)
            # The last stage finishes microbatch ``t - (S-1)`` at tick t.
            widx = t - last
            valid = jnp.logical_and(stage == last, widx >= 0)
            w = jnp.clip(widx, 0, M - 1)
            outs = jax.tree_util.tree_map(
                lambda o, yy: o.at[w].set(jnp.where(valid, yy, o[w])), outs, y
            )
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            cur = jax.tree_util.tree_map(
                lambda yy: jax.lax.ppermute(yy, axis, perm), y
            )
            return cur, outs

        zero_mb = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x[0]), mb)
        outs0 = jax.tree_util.tree_map(jnp.zeros_like, mb)
        _, outs = jax.lax.fori_loop(0, M + n_stages - 1, tick, (zero_mb, outs0))
        # Only the last stage holds real outputs; psum replicates them so the
        # result is axis-invariant (cheap at these sizes; a production
        # variant would leave them stage-local and reduce-scatter instead).
        return jax.tree_util.tree_map(
            lambda o: jax.lax.psum(
                jnp.where(stage == last, o, jnp.zeros_like(o)), axis
            ),
            outs,
        )

    out = shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )(stacked_params, mb)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((B,) + x.shape[2:]), out
    )
