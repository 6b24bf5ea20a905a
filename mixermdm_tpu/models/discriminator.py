"""Timestep+text-conditioned sequence discriminator (per-frame logits).

Parity source ``/root/reference/src/models/utils/discriminators.py:7-77``.
Used twice by MixerMDM: individual head (262 feats) and interaction head
(524 feats).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .blocks import TransformerBlockSimple
from .embeddings import PositionalEncoding, TimestepEmbedder
from .layers import TorchLinear, maybe_remat


class _SimpleScanBody(nn.Module):
    latent_dim: int
    num_heads: int
    ff_size: int
    dropout: float
    train: bool

    @nn.compact
    def __call__(self, h, emb, kpm):
        h = TransformerBlockSimple(
            latent_dim=self.latent_dim, num_heads=self.num_heads,
            ff_size=self.ff_size, dropout=self.dropout, name="block",
        )(h, emb, kpm, self.train)
        return h, None


class DiscriminatorTransformer(nn.Module):
    input_feats: int
    latent_dim: int = 256
    ff_size: int = 512
    num_layers: int = 2
    num_heads: int = 4
    text_emb_dim: int = 768
    dropout: float = 0.0
    scan_layers: bool = True

    @nn.compact
    def __call__(self, x, timesteps, mask=None, cond=None, train: bool = False):
        B, T = x.shape[0], x.shape[1]

        cond_emb = TimestepEmbedder(self.latent_dim, name="embed_timestep")(timesteps)
        cond_emb = cond_emb + TorchLinear(self.latent_dim, name="text_embed")(cond)

        h = TorchLinear(self.latent_dim, name="motion_embed")(x)
        h = PositionalEncoding(self.latent_dim, name="sequence_pos_encoder")(h)

        if mask is None:
            key_padding_mask = jnp.zeros((B, T), dtype=bool)
        else:
            m = mask[..., 0] if mask.ndim == 3 else mask
            key_padding_mask = ~(m > 0.5)

        if self.scan_layers:
            stack = nn.scan(
                maybe_remat(_SimpleScanBody),
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_layers,
            )(self.latent_dim, self.num_heads, self.ff_size, self.dropout,
              train, name="blocks")
            h, _ = stack(h, cond_emb, key_padding_mask)
        else:
            for i in range(self.num_layers):
                h = TransformerBlockSimple(
                    latent_dim=self.latent_dim,
                    num_heads=self.num_heads,
                    ff_size=self.ff_size,
                    dropout=self.dropout,
                    name=f"blocks_{i}",
                )(h, cond_emb, key_padding_mask, train)

        return TorchLinear(1, name="out")(h)  # (B, T, 1) per-frame logits
