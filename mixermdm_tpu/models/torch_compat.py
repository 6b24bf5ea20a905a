"""torch ``nn.TransformerEncoder`` -compatible stack (post-norm, GELU).

Used wherever the reference drops in a stock torch encoder: the trainable
CLIP post-encoders (``/root/reference/src/models/in2in.py:25-53``,
``mixermdm.py:244-256``), the MDM denoiser backbone (``mdm.py:253-264``), and
the InterCLIP towers (``evaluation/models.py:38-45,113-124``).

torch semantics reproduced: ``norm_first=False`` (post-norm), affine
LayerNorm eps 1e-5, attention without ``add_zero_attn``, GELU FFN.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .layers import TorchLinear, TorchMultiheadAttention, remat_scan_enabled


class LayerNormAffine(nn.Module):
    """LayerNorm with learnable scale/bias (torch default, eps 1e-5)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)  # f32 statistics under bf16 compute
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (y * scale + bias).astype(x.dtype)


class TorchEncoderLayer(nn.Module):
    """One ``nn.TransformerEncoderLayer`` (batch_first, post-norm, gelu)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, key_padding_mask=None, attn_mask=None, train: bool = False):
        attn = TorchMultiheadAttention(
            self.d_model, self.nhead, add_zero_attn=False, dropout=self.dropout,
            name="self_attn",
        )(x, x, x, key_padding_mask, attn_mask, train=train)
        if self.dropout > 0.0:
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = LayerNormAffine(self.d_model, name="norm1")(x + attn)
        h = TorchLinear(self.dim_feedforward, name="linear1")(x)
        h = nn.gelu(h, approximate=False)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = TorchLinear(self.d_model, name="linear2")(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return LayerNormAffine(self.d_model, name="norm2")(x + h)


class _EncoderScanBody(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    train: bool

    @nn.compact
    def __call__(self, x, key_padding_mask, attn_mask):
        x = TorchEncoderLayer(
            self.d_model, self.nhead, self.dim_feedforward, self.dropout,
            name="layer",
        )(x, key_padding_mask, attn_mask, self.train)
        return x, None


class TorchEncoder(nn.Module):
    """Stack of :class:`TorchEncoderLayer` (``nn.TransformerEncoder``).

    ``scan_layers`` compiles ONE layer body via nn.scan (params stacked under
    ``layers/layer``) instead of ``num_layers`` unrolled copies.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int
    dropout: float = 0.0
    scan_layers: bool = True

    @nn.compact
    def __call__(self, x, key_padding_mask=None, attn_mask=None, train: bool = False):
        if self.scan_layers:
            stack = nn.scan(
                (nn.remat(_EncoderScanBody, prevent_cse=False)
                     if remat_scan_enabled() else _EncoderScanBody),
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_layers,
            )(self.d_model, self.nhead, self.dim_feedforward, self.dropout,
              train, name="layers")
            x, _ = stack(x, key_padding_mask, attn_mask)
            return x
        for i in range(self.num_layers):
            x = TorchEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                name=f"layers_{i}",
            )(x, key_padding_mask, attn_mask, train)
        return x


class ClipPostEncoder(nn.Module):
    """2-layer trainable encoder + LayerNorm over CLIP token features.

    (reference in2in.py:24-53 / mixermdm.py:244-256; returns per-token
    features — EOT pooling happens in the text pipeline.)
    """

    d_model: int = 768
    num_layers: int = 2
    dim_feedforward: int = 2048
    nhead: int = 8
    dropout: float = 0.1  # reference post-encoders use p=0.1 (in2in.py:29)

    @nn.compact
    def __call__(self, clip_tokens, train: bool = False):
        h = TorchEncoder(
            self.d_model, self.nhead, self.dim_feedforward, self.num_layers,
            dropout=self.dropout, name="encoder",
        )(clip_tokens, train=train)
        return LayerNormAffine(self.d_model, name="ln")(h)
