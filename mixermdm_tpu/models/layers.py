"""NN primitives: AdaLN, torch-compatible multi-head attention, FFN.

flax.linen re-design of the reference's primitives
(``/root/reference/src/models/utils/layers.py``: ``AdaLN``:3,
``VanillaSelfAttention``:28, ``VanillaSelfAttentionSimple``:48,
``VanillaCrossAttention``:68, ``FFN``:91, ``FinalLayer``:109).

Numerical-parity notes:

* The reference uses ``nn.MultiheadAttention(..., add_zero_attn=True)``:
  after input projection a zero key/value token is appended and is always
  attendable, so a fully-masked query row still softmaxes over one zero
  logit instead of NaN-ing.  :class:`TorchMultiheadAttention` reproduces
  that exactly (zero K/V column + an always-False entry appended to the
  key-padding mask).
* AdaLN = LayerNorm(affine-free, eps 1e-6) scaled/shifted by a zero-init
  SiLU MLP of the conditioning embedding, so at init every AdaLN block is an
  identity-normalised passthrough.
* Projection layers marked ``zero_module`` in the reference are zero-init
  here so fresh models match the reference's residual-starts-at-zero
  behaviour.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn
from jax.nn import silu

# Master XLA-only switch: a model-sharded run (Megatron tensor parallelism
# over a "model" mesh axis, parallel/mesh.tp_shard_params) needs the whole
# forward to be GSPMD-partitionable XLA — the Pallas kernels and the int8
# custom paths are single-chip programs.  When set, every dispatch site
# (attention, fused blocks, quant) routes to plain XLA regardless of the
# finer-grained knobs below, including ``fused_scope`` re-enables inside
# training traces.  CLIs set this when ``--tp`` is requested.
_XLA_ONLY: bool = False


def set_xla_only(enabled: bool = True) -> None:
    global _XLA_ONLY
    _XLA_ONLY = enabled


def xla_only() -> bool:
    return _XLA_ONLY


# Pallas fused-attention dispatch: None = auto (on for TPU backends),
# True/False to force.  Set via ``set_pallas_attention``.
_PALLAS_ATTENTION: Optional[bool] = None


def set_pallas_attention(enabled: Optional[bool]) -> None:
    global _PALLAS_ATTENTION
    _PALLAS_ATTENTION = enabled


# Fused sub-block kernels (ops/fused_block.py) have no VJP — trainers keep
# pallas ATTENTION on (it has a hand-written backward kernel) but disable
# the block fusion at trace time.
_FUSED_BLOCKS: bool = True


def set_fused_blocks(enabled: bool) -> None:
    global _FUSED_BLOCKS
    _FUSED_BLOCKS = enabled


# W8A8 trace-time scope: inside it, the fused sub-block kernels run their
# projections on the MXU int8 path (2x bf16 rate on v5e) — per-channel
# weight scales, dynamic per-token activation scales.  Systems wrap their
# FROZEN denoiser calls in this scope (sampling only; the trainable mixer
# and all training graphs stay bf16/f32).
_W8A8: bool = False

# Width gate: int8 only pays where the matmuls dominate the per-row
# activation-quant VPU overhead.  Measured on the bench workload (round 3,
# in-kernel-residual fused kernels): E>=512 (denoisers + mixer core) 6.99
# samples/sec vs 6.86 at a 768 gate; a 256 gate adds nothing further.  The
# round-2 "-2% at E=512" result predates the fused residual path and is
# superseded.  Distribution-level acceptance (scripts/quant_ab.py) ran with
# the gate forced to 128 — a superset of this default.
_W8A8_MIN_DIM = 512


def _w8a8_for(latent_dim: int) -> bool:
    return _W8A8 and not _XLA_ONLY and latent_dim >= _W8A8_MIN_DIM


def set_w8a8_min_dim(n: int) -> None:
    """Override the int8 width gate (experiments only — e.g. the
    distribution-level quant A/B forces int8 onto tiny test models where the
    default >=512 gate would never engage)."""
    global _W8A8_MIN_DIM
    _W8A8_MIN_DIM = n


class w8a8_scope:
    """Enable-only scope: ``w8a8_scope(False)`` leaves the current state
    untouched (so an inner call site with quant off cannot cancel an outer
    whole-trace quant scope)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global _W8A8
        self.prev = _W8A8
        if self.enabled:
            _W8A8 = True

    def __exit__(self, *exc):
        global _W8A8
        _W8A8 = self.prev


# Rematerialise scanned layer bodies (jax.checkpoint).  Pays FLOPs for
# memory on the DIFFERENTIATED stacks; fused_scope disables it for frozen
# subgraphs — nothing is differentiated through them, so remat would only
# force a linearization of (VJP-less) kernels it can never need.
_REMAT_SCAN: bool = True


def remat_scan_enabled() -> bool:
    return _REMAT_SCAN


def set_remat_scan(enabled: bool) -> None:
    """Toggle scan-body rematerialisation for DIFFERENTIATED stacks.

    Remat trades recompute FLOPs for saved-activation HBM.  The mixer
    training graph's differentiated nets (mixer core + influence,
    discriminators, text post-encoders) are small enough that their saved
    activations fit at production batch sizes — trainers A/B this via
    ``scripts/bench_train.py --no-remat`` (measurements in BASELINE.md)."""
    global _REMAT_SCAN
    _REMAT_SCAN = enabled


# Optional jax.checkpoint POLICY for the scan-body remat: a middle ground
# between plain remat (save only the carry, recompute the whole body in the
# backward) and no-remat (save every intermediate).  "dots" saves matmul
# outputs but recomputes elementwise/softmax work — often the TPU sweet spot
# when the step is HBM-bound (BASELINE.md round-4 A/B).
_REMAT_POLICY: str | None = None


def set_remat_policy(name: str | None) -> None:
    """``None`` (default) = plain remat; "dots" =
    ``dots_with_no_batch_dims_saveable``; "dots_all" = ``dots_saveable``
    (also saves the attention logit/probability matmuls)."""
    if name not in (None, "dots", "dots_all"):
        raise ValueError(f"unknown remat policy {name!r}")
    global _REMAT_POLICY
    _REMAT_POLICY = name


def maybe_remat(body):
    """Wrap a scan body per the remat toggles: identity when remat is off,
    ``nn.remat`` with the configured checkpoint policy when on.  Read at
    TRACE time, like the other layer-scope globals."""
    import flax.linen as nn
    import jax

    if not _REMAT_SCAN:
        return body
    kw = {}
    if _REMAT_POLICY == "dots":
        kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif _REMAT_POLICY == "dots_all":
        kw["policy"] = jax.checkpoint_policies.dots_saveable
    return nn.remat(body, prevent_cse=False, **kw)


class fused_scope:
    """Trace-time re-enable of the fused (VJP-less) kernels inside a
    FROZEN subgraph of a training trace.

    Trainers disable fused blocks (and pick XLA attention) globally for the
    differentiated graph — but the mixer's frozen denoisers never need a
    VJP: their params are not differentiated and their inputs (x_t, t, the
    stop-gradiented frozen text conds — ``systems.mixermdm.encode_cond``)
    carry no tangents, mirroring the reference where the frozen submodels'
    conds come from their own frozen encoders (mixermdm.py:62-65,340-356).
    Attention goes back to "auto" (Pallas on TPU, XLA on CPU tests) and
    scan-remat turns off (no residuals are ever saved for frozen stacks)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global _FUSED_BLOCKS, _PALLAS_ATTENTION, _REMAT_SCAN
        self.prev = (_FUSED_BLOCKS, _PALLAS_ATTENTION, _REMAT_SCAN)
        if self.enabled and not _XLA_ONLY:
            _FUSED_BLOCKS = True
            _PALLAS_ATTENTION = None
            _REMAT_SCAN = False

    def __exit__(self, *exc):
        global _FUSED_BLOCKS, _PALLAS_ATTENTION, _REMAT_SCAN
        _FUSED_BLOCKS, _PALLAS_ATTENTION, _REMAT_SCAN = self.prev


def use_pallas_attention() -> bool:
    if _XLA_ONLY:
        return False
    if _PALLAS_ATTENTION is not None:
        return _PALLAS_ATTENTION
    import jax

    return jax.default_backend() == "tpu"


# Megatron-style sequence parallelism (GSPMD formulation): when a model mesh
# axis is in play, the residual stream between sub-layers is constrained to
# (batch -> data, sequence -> model) sharding.  GSPMD then turns the
# row-parallel matmul psum into reduce-scatter over the sequence dim and
# re-gathers before the next attention/FFN — LayerNorm/AdaLN/dropout compute
# on sequence shards, cutting both activation memory and the replicated
# elementwise work per TP rank.  A pure layout hint: outputs are unchanged
# (asserted vs dp in tests/test_parallel.py).  Set via the ``--sp`` CLI flag
# (requires ``--tp``); None = off.
_SEQ_PARALLEL = None  # Optional[(Mesh, data_axis, model_axis)]


def set_sequence_parallel(mesh=None, data_axis: str = "data",
                          model_axis: str = "model") -> None:
    global _SEQ_PARALLEL
    _SEQ_PARALLEL = None if mesh is None else (mesh, data_axis, model_axis)


def seq_constraint(x):
    """Constrain a (B, T, E) residual-stream activation to batch x sequence
    sharding under sequence parallelism; identity when SP is off, the leaf
    is not rank-3, or T does not divide over the model axis."""
    if _SEQ_PARALLEL is None or getattr(x, "ndim", 0) != 3:
        return x
    mesh, da, ma = _SEQ_PARALLEL
    if x.shape[1] % mesh.shape[ma] != 0:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, PartitionSpec(da, ma, None))
    )


class TorchLinear(nn.Module):
    """Dense layer with torch's default init (keeps init-scale parity)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    in_features: Optional[int] = None  # required only for params-only calls

    @nn.compact
    def __call__(self, x=None):
        """Apply the layer, or — with ``x=None`` — just materialise and
        return ``(kernel, bias)`` so callers can fuse several projections
        into one matmul."""
        import jax
        in_features = self.in_features if x is None else x.shape[-1]
        bound = 1.0 / (in_features ** 0.5)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (in_features, self.features),
        )
        bias = (
            self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.features,),
            )
            if self.use_bias
            else None
        )
        if x is None:
            return kernel, bias
        y = x @ kernel.astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(x.dtype)
        return y


class ZeroLinear(nn.Module):
    """Zero-initialised dense (reference ``zero_module``, utils.py:91-97)."""

    features: int
    in_features: Optional[int] = None  # required only for params-only calls

    @nn.compact
    def __call__(self, x=None):
        in_features = self.in_features if x is None else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.zeros, (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if x is None:
            return kernel, bias
        return x @ kernel.astype(x.dtype) + bias.astype(x.dtype)


def layer_norm(x, eps: float = 1e-5):
    """Affine-free LayerNorm over the last axis (f32 statistics, so the
    bf16 compute path keeps full normalisation precision)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(x.dtype)


class AdaLN(nn.Module):
    """Adaptive LayerNorm conditioned on a (B, D) embedding (layers.py:3-25)."""

    latent_dim: int

    @nn.compact
    def __call__(self, h, emb, modulation_only: bool = False):
        # emb: (B, E) -> scale/shift (B, 2*latent); zero-init => identity at init.
        emb_out = ZeroLinear(2 * self.latent_dim, name="emb_proj")(silu(emb))
        dt = emb.dtype if h is None else h.dtype
        scale, shift = jnp.split(emb_out.astype(dt), 2, axis=-1)
        if modulation_only:
            # For fused Pallas blocks: the LN + modulation happen in-kernel.
            return scale, shift
        return layer_norm(h, eps=1e-6) * (1.0 + scale[:, None]) + shift[:, None]


class TorchMultiheadAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` semantics with ``add_zero_attn=True``.

    Weight layout mirrors torch so checkpoint converters can map
    ``in_proj_weight``/``out_proj`` directly: separate q/k/v projections with
    bias, scaled dot-product over heads, output projection.
    ``key_padding_mask`` follows torch polarity — True = *ignore* this key.
    """

    embed_dim: int
    num_heads: int
    kdim: Optional[int] = None
    vdim: Optional[int] = None
    add_zero_attn: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, attn_mask=None,
                 train: bool = False, params_only: bool = False):
        E, H = self.embed_dim, self.num_heads
        head_dim = E // H

        if params_only:
            # Raw projection params for fused Pallas block kernels.
            kd = self.kdim or E
            vd = self.vdim or E
            return (
                TorchLinear(E, name="q_proj", in_features=E)(None),
                TorchLinear(E, name="k_proj", in_features=kd)(None),
                TorchLinear(E, name="v_proj", in_features=vd)(None),
                TorchLinear(E, name="out_proj", in_features=E)(None),
            )

        B, Tq, _ = query.shape
        Tk = key.shape[1]

        # NOTE: a fused (E, 3E) self-attention QKV projection was measured at
        # parity with three separate matmuls here (XLA already schedules them
        # well and the per-call kernel concat cancels the gain), so the
        # simple converter-friendly layout stays.
        q = TorchLinear(E, name="q_proj")(query)
        k = TorchLinear(E, name="k_proj")(key)
        v = TorchLinear(E, name="v_proj")(value)

        if use_pallas_attention() and not (train and self.dropout > 0.0):
            # Fused VMEM kernel; zero-attn is handled algebraically inside
            # (extra exp(-row_max) denominator term), no K/V concat needed.
            # (Training with attention dropout takes the XLA path.)
            from ..ops.attention import fused_attention

            qh = q.reshape(B, Tq, H, head_dim).transpose(0, 2, 1, 3)
            kh = k.reshape(B, Tk, H, head_dim).transpose(0, 2, 1, 3)
            vh = v.reshape(B, Tk, H, head_dim).transpose(0, 2, 1, 3)
            out = fused_attention(
                qh, kh, vh, key_padding_mask, attn_mask, zero_attn=self.add_zero_attn
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, Tq, E)
            return TorchLinear(E, name="out_proj")(out)

        if self.add_zero_attn:
            # Append an always-attendable zero key/value token.
            zeros = jnp.zeros((B, 1, E), dtype=q.dtype)
            k = jnp.concatenate([k, zeros], axis=1)
            v = jnp.concatenate([v, zeros], axis=1)
            Tk = Tk + 1
            if key_padding_mask is not None:
                pad = jnp.zeros((B, 1), dtype=bool)
                key_padding_mask = jnp.concatenate([key_padding_mask, pad], axis=1)
            if attn_mask is not None:
                attn_mask = jnp.pad(attn_mask, ((0, 0), (0, 1)))

        q = q.reshape(B, Tq, H, head_dim)
        k = k.reshape(B, Tk, H, head_dim)
        v = v.reshape(B, Tk, H, head_dim)

        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=q.dtype))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)

        if key_padding_mask is not None:
            # torch polarity: True = masked.
            logits = jnp.where(
                key_padding_mask[:, None, None, :], jnp.asarray(-jnp.inf, logits.dtype), logits
            )
        if attn_mask is not None:
            # Additive float mask of shape (Tq, Tk), e.g. a causal mask.
            logits = logits + attn_mask[None, None, :, :].astype(logits.dtype)

        attn = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        attn = attn / attn.sum(axis=-1, keepdims=True)
        if self.dropout > 0.0:
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Tq, E)
        return TorchLinear(E, name="out_proj")(out)


def _fusable_block(x, latent_dim: int, num_heads: int, train: bool) -> bool:
    """Whether the fused AdaLN+MHA Pallas block applies: bf16 production
    path, lane-aligned head slices (the in-kernel per-head column slicing
    needs 128-multiples), inference only."""
    return (
        use_pallas_attention()
        and _FUSED_BLOCKS
        and not train
        and x.dtype == jnp.bfloat16
        and latent_dim % 128 == 0
        # 64-lane head slices compile via a Mosaic relayout; measured fine.
        and (latent_dim // num_heads) % 64 == 0
    )


class VanillaSelfAttention(nn.Module):
    """AdaLN-conditioned self-attention (layers.py:28-45)."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb, key_padding_mask=None, train: bool = False,
                 residual: bool = False):
        if _fusable_block(x, self.latent_dim, self.num_heads, train):
            from ..ops.fused_block import fused_sa_block

            scale, shift = AdaLN(self.latent_dim, name="norm")(
                None, emb, modulation_only=True
            )
            (wq, bq), (wk, bk), (wv, bv), (wo, bo) = TorchMultiheadAttention(
                self.latent_dim, self.num_heads, dropout=self.dropout,
                name="attention",
            )(None, None, None, params_only=True)
            return fused_sa_block(
                x, scale, shift, wq, bq, wk, bk, wv, bv, wo, bo,
                key_padding_mask, n_heads=self.num_heads, residual=residual,
                quant=_w8a8_for(self.latent_dim),
            )
        x_norm = AdaLN(self.latent_dim, name="norm")(x, emb)
        out = TorchMultiheadAttention(
            self.latent_dim, self.num_heads, dropout=self.dropout, name="attention"
        )(x_norm, x_norm, x_norm, key_padding_mask, train=train)
        return out + x if residual else out


class VanillaSelfAttentionSimple(nn.Module):
    """Plain-LN self-attention for discriminators (layers.py:48-65)."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, key_padding_mask=None, train: bool = False):
        x_norm = layer_norm(x, eps=1e-6)
        return TorchMultiheadAttention(
            self.latent_dim, self.num_heads, dropout=self.dropout, name="attention"
        )(x_norm, x_norm, x_norm, key_padding_mask, train=train)


class VanillaCrossAttention(nn.Module):
    """AdaLN-conditioned cross-attention (layers.py:68-88)."""

    latent_dim: int
    xf_latent_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, xf, emb, key_padding_mask=None, train: bool = False,
                 residual: bool = False):
        if (
            _fusable_block(x, self.latent_dim, self.num_heads, train)
            and self.xf_latent_dim == self.latent_dim
        ):
            from ..ops.fused_block import fused_ca_block

            scale, shift = AdaLN(self.latent_dim, name="norm")(
                None, emb, modulation_only=True
            )
            xf_scale, xf_shift = AdaLN(self.xf_latent_dim, name="xf_norm")(
                None, emb, modulation_only=True
            )
            (wq, bq), (wk, bk), (wv, bv), (wo, bo) = TorchMultiheadAttention(
                self.latent_dim, self.num_heads,
                kdim=self.xf_latent_dim, vdim=self.xf_latent_dim,
                dropout=self.dropout, name="attention",
            )(None, None, None, params_only=True)
            return fused_ca_block(
                x, xf, scale, shift, xf_scale, xf_shift,
                wq, bq, wk, bk, wv, bv, wo, bo,
                key_padding_mask, n_heads=self.num_heads, residual=residual,
                quant=_w8a8_for(self.latent_dim),
            )
        x_norm = AdaLN(self.latent_dim, name="norm")(x, emb)
        xf_norm = AdaLN(self.xf_latent_dim, name="xf_norm")(xf, emb)
        out = TorchMultiheadAttention(
            self.latent_dim, self.num_heads,
            kdim=self.xf_latent_dim, vdim=self.xf_latent_dim, dropout=self.dropout,
            name="attention",
        )(x_norm, xf_norm, xf_norm, key_padding_mask, train=train)
        return out + x if residual else out


class FFN(nn.Module):
    """AdaLN-conditioned GELU MLP, zero-init output (layers.py:91-106).

    Dropout sits between the activation and the output projection
    (reference: ``linear2(dropout(activation(linear1(x))))``)."""

    latent_dim: int
    ffn_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb=None, train: bool = False, residual: bool = False):
        if (
            use_pallas_attention() and _FUSED_BLOCKS and not train
            and x.dtype == jnp.bfloat16
            and self.latent_dim % 128 == 0 and self.ffn_dim % 128 == 0
        ):
            from ..ops.fused_block import fused_ffn_block

            if emb is not None:
                scale, shift = AdaLN(self.latent_dim, name="norm")(
                    None, emb, modulation_only=True
                )
            else:
                scale = shift = None
            w1, b1 = TorchLinear(self.ffn_dim, name="linear1",
                                 in_features=self.latent_dim)(None)
            w2, b2 = ZeroLinear(self.latent_dim,
                                in_features=self.ffn_dim, name="linear2")(None)
            return fused_ffn_block(x, scale, shift, w1, b1, w2, b2,
                                   residual=residual,
                                   quant=_w8a8_for(self.latent_dim))
        h_in = x
        if emb is not None:
            h_in = AdaLN(self.latent_dim, name="norm")(x, emb)
        h = TorchLinear(self.ffn_dim, name="linear1")(h_in)
        h = nn.gelu(h, approximate=False)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = ZeroLinear(self.latent_dim, name="linear2")(h)
        return out + x if residual else out


class FinalLayer(nn.Module):
    """Zero-init output projection (layers.py:109-116)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        return ZeroLinear(self.out_dim, name="linear")(x)
