"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's Lightning ``DDPStrategy``/NCCL
data parallelism (``/root/reference/src/scripts/train/mixermdm.py:25,333``):
a 1-D ``jax.sharding.Mesh`` over the ``data`` axis, params replicated,
batches sharded — XLA SPMD inserts the gradient ``psum`` over ICI where DDP
would all-reduce over NCCL.  Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` (no code changes in the train step).

Beyond parity, ``make_mesh_2d`` + ``tp_shard_params`` add Megatron-style
tensor parallelism over a second ``model`` axis (column-parallel q/k/v +
FFN-up, row-parallel out/FFN-down; GSPMD inserts the per-layer psums).
Sharding stays a pure layout change: the TP tests assert bitwise-equal
losses, updates and samples vs the replicated dp path.  TP rides the XLA
compute path — the Pallas fused kernels are single-chip programs, so
``fused_scope``/quant stay off when a model axis is in play.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host setup: one call per host before building the mesh.

    Wraps ``jax.distributed.initialize`` (auto-detects on TPU pods).  After
    this, ``jax.devices()`` spans all hosts and the same 1-D data mesh code
    runs SPMD across ICI+DCN — the TPU-native replacement for the
    reference's ``PL_TORCH_DISTRIBUTED_BACKEND=nccl`` + Lightning DDP spawn
    (scripts/train/mixermdm.py:25,333).
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


# Mesh construction is memoised: a Mesh is an immutable device-layout
# descriptor, and XLA:CPU's in-process collectives (the virtual-device test
# mesh) key their rendezvous per communicator instance — running a SECOND
# freshly-built identical mesh's subset collectives in one process can
# deadlock-abort (observed: two sequential dp x tp training programs on two
# fresh 4x2 meshes; reusing the Mesh object is clean).  On real TPU this
# costs nothing and avoids duplicated communicator setup.
_MESH_CACHE: dict = {}


def _mesh(devices: np.ndarray, axes: tuple) -> Mesh:
    key = (tuple(devices.flat), devices.shape, tuple(axes))
    mesh = _MESH_CACHE.get(key)
    if mesh is None:
        mesh = _MESH_CACHE.setdefault(key, Mesh(devices, axes))
    return mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return _mesh(np.asarray(devices), (axis,))


def make_mesh_2d(
    n_data: int, n_model: int, axes: tuple = ("data", "model")
) -> Mesh:
    """2-D dp x tp mesh.  The model axis is the FAST (innermost) axis so
    tensor-parallel collectives (the per-layer ``psum`` of row-parallel
    matmul partials) ride neighbouring ICI links while the data axis'
    once-per-step gradient psum spans the slower hops."""
    devices = jax.devices()[: n_data * n_model]
    if len(devices) < n_data * n_model:
        raise RuntimeError(
            f"need {n_data * n_model} devices, have {len(devices)}"
        )
    return _mesh(np.asarray(devices).reshape(n_data, n_model), axes)


def make_data_mesh_for_batch(batch_size: int, axis: str = "data") -> Mesh:
    """Largest data mesh whose size divides the batch (a batch of 2 cannot
    shard over 8 devices)."""
    n_avail = len(jax.devices())
    n = max(d for d in range(1, n_avail + 1) if batch_size % d == 0)
    return make_mesh(n, axis)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place every leaf with a leading batch dim on the data axis."""
    sh = data_sharded(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)


# ---------------------------------------------------------------------------
# Tensor parallelism (Megatron-style) over the "model" mesh axis.
#
# Every transformer stack in the framework (denoisers, discriminators,
# influence net, CLIP towers, post-encoders) uses the same leaf names, so one
# name-driven rule shards them all:
#
#   column-parallel (split OUTPUT features; activations become
#   head/hidden-sharded, no communication on entry):
#       q_proj / k_proj / v_proj   attention input projections
#       linear1 / c_fc             FFN up-projections
#   row-parallel (split INPUT features; XLA inserts the psum that reduces
#   the partial products back to a replicated activation):
#       out_proj                   attention output projection
#       linear2 / c_proj           FFN down-projections
#
# Everything else (LayerNorm/AdaLN params, embeddings, IO heads) stays
# replicated, so normalisations act on full feature vectors locally — the
# classic Megatron sandwich.  GSPMD propagates the kernel shardings through
# the (B,T,E)->(B,H,T,Dh) head reshapes, which is why the head count must be
# divisible by the model-axis size; leaves whose shard dim is not divisible
# fall back to replicated (tiny models, odd feature widths).
# ---------------------------------------------------------------------------

_COLUMN_PARALLEL = frozenset({"q_proj", "k_proj", "v_proj", "linear1", "c_fc"})
_ROW_PARALLEL = frozenset({"out_proj", "linear2", "c_proj"})


def tp_spec(path, leaf, n_model: int, model_axis: str = "model") -> P:
    """PartitionSpec for one param leaf under tensor parallelism.

    ``path`` is a jax key path (tree_map_with_path).  Kernels are
    ``(..., in, out)`` (optionally scan-stacked with a leading layer dim),
    biases ``(..., out)``.
    """
    names = [getattr(k, "key", str(k)) for k in path]
    if len(names) < 2:
        return P()
    parent, leafname = names[-2], names[-1]
    ndim = leaf.ndim

    def shard_dim(d: int) -> P:
        if leaf.shape[d] % n_model != 0:
            return P()
        spec = [None] * ndim
        spec[d] = model_axis
        return P(*spec)

    if parent in _COLUMN_PARALLEL:
        # kernel (..., in, out) and bias (..., out): split the output dim.
        return shard_dim(ndim - 1)
    if parent in _ROW_PARALLEL:
        if leafname == "kernel" and ndim >= 2:
            return shard_dim(ndim - 2)  # split the input dim
        return P()  # bias adds AFTER the psum: replicated
    return P()


def tp_shard_params(params, mesh: Mesh, model_axis: str = "model"):
    """Place a param tree with Megatron TP shardings over ``mesh``'s model
    axis (non-shardable leaves replicate).  Shard BEFORE building optimizer
    state so the moments inherit the same layout."""
    n_model = mesh.shape[model_axis]

    def place(path, x):
        return jax.device_put(
            x, NamedSharding(mesh, tp_spec(path, x, n_model, model_axis))
        )

    return jax.tree_util.tree_map_with_path(place, params)


# ---------------------------------------------------------------------------
# FSDP / ZeRO-3 parameter sharding over the "data" mesh axis.
#
# Each param leaf is split along ONE dimension across the data-parallel
# devices; under jit, GSPMD all-gathers the leaf where the forward consumes
# it and reduce-scatters its gradient, so per-device HBM holds 1/n_data of
# the params and of the Adam moments (build the optimizer state AFTER
# sharding so ``zeros_like`` inherits the layout).  This is a pure layout
# change — the compiled math is the all-gathered full-weight matmul, so
# results match the replicated dp path (asserted in tests/test_parallel.py).
#
# For a model this size FSDP is about capability, not need (the whole system
# fits one chip several times over — SURVEY.md §5's "no TP/SP needed"
# applies to memory too); it exists so the framework composes dp x tp x fsdp
# the way production JAX stacks do, and it is exercised by the multichip
# dryrun.
# ---------------------------------------------------------------------------


def fsdp_spec(path, leaf, n_data: int, data_axis: str = "data",
              base: Optional[P] = None, min_size: int = 0) -> P:
    """PartitionSpec splitting one dim of ``leaf`` over the data axis.

    ``base`` (e.g. a :func:`tp_spec`) is preserved; FSDP takes the largest
    REMAINING dim divisible by ``n_data``.  Leaves smaller than ``min_size``
    elements, and leaves with no divisible free dim, keep ``base``.
    """
    ndim = leaf.ndim
    spec = ([None] * ndim if base is None
            else list(base) + [None] * (ndim - len(base)))
    if leaf.size < max(min_size, 1):
        return P(*spec)
    cands = [d for d in range(ndim)
             if spec[d] is None and leaf.shape[d] >= n_data
             and leaf.shape[d] % n_data == 0]
    if not cands:
        return P(*spec)
    spec[max(cands, key=lambda d: leaf.shape[d])] = data_axis
    return P(*spec)


def fsdp_shard_params(params, mesh: Mesh, data_axis: str = "data",
                      model_axis: str = "model", min_size: int = 0):
    """Place a param tree with ZeRO-3 shardings over ``mesh``'s data axis.

    If the mesh also carries a model axis (>1), Megatron TP rules
    (:func:`tp_spec`) apply first and FSDP shards the largest remaining
    divisible dim — the standard 2-D (tp within, fsdp across) layout.
    Shard BEFORE ``optimizer.init`` so moments inherit the layout.
    """
    n_data = mesh.shape[data_axis]
    n_model = mesh.shape.get(model_axis, 1)

    def place(path, x):
        base = tp_spec(path, x, n_model, model_axis) if n_model > 1 else None
        sp = fsdp_spec(path, x, n_data, data_axis, base=base, min_size=min_size)
        return jax.device_put(x, NamedSharding(mesh, sp))

    return jax.tree_util.tree_map_with_path(place, params)
