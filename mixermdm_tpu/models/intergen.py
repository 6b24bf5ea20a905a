"""InterGen denoiser: dual-stream weight-shared blocks with cross-person CA.

Parity source ``/root/reference/src/models/intergen.py``: ``InterDenoiser``:215.
Person streams are stacked into the batch axis (same MXU-batching trick as
:mod:`.in2in`): the reference runs each block twice per layer with shared
weights (intergen.py:277-281).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .blocks import TransformerBlock
from .embeddings import PositionalEncoding, TimestepEmbedder
from .layers import FinalLayer, TorchLinear, maybe_remat


class _InterScanBody(nn.Module):
    latent_dim: int
    num_heads: int
    ff_size: int
    dropout: float
    swap_half: int
    train: bool

    @nn.compact
    def __call__(self, h, emb, kpm):
        partner = jnp.concatenate([h[self.swap_half:], h[: self.swap_half]], axis=0)
        h = TransformerBlock(
            latent_dim=self.latent_dim, num_heads=self.num_heads,
            ff_size=self.ff_size, dropout=self.dropout, name="block",
        )(h, partner, emb, kpm, self.train)
        return h, None


class InterDenoiser(nn.Module):
    input_feats: int
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    text_dim: int = 768
    dropout: float = 0.0
    scan_layers: bool = True

    @nn.compact
    def __call__(self, x, timesteps, mask=None, cond=None, train: bool = False):
        B, T = x.shape[0], x.shape[1]

        t_emb = TimestepEmbedder(self.latent_dim, name="embed_timestep")(timesteps)
        emb = t_emb + TorchLinear(self.latent_dim, name="text_embed")(cond[:, : self.text_dim])

        motion_embed = TorchLinear(self.latent_dim, name="motion_embed")
        pos_enc = PositionalEncoding(self.latent_dim, name="sequence_pos_encoder")

        if mask is None:
            key_padding_mask = jnp.zeros((B, T), dtype=bool)
        else:
            m = mask[..., 0] if mask.ndim == 3 else mask
            key_padding_mask = ~(m > 0.5)

        x_a = x[..., : self.input_feats]
        x_b = x[..., self.input_feats :]
        h = pos_enc(motion_embed(jnp.concatenate([x_a, x_b], axis=0)))
        emb2 = jnp.concatenate([emb, emb], axis=0)
        kpm = jnp.concatenate([key_padding_mask, key_padding_mask], axis=0)

        if self.scan_layers:
            stack = nn.scan(
                maybe_remat(_InterScanBody),
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_layers,
            )(self.latent_dim, self.num_heads, self.ff_size, self.dropout,
              B, train, name="blocks")
            h, _ = stack(h, emb2, kpm)
        else:
            for i in range(self.num_layers):
                partner = jnp.concatenate([h[B:], h[:B]], axis=0)
                h = TransformerBlock(
                    latent_dim=self.latent_dim,
                    num_heads=self.num_heads,
                    ff_size=self.ff_size,
                    dropout=self.dropout,
                    name=f"blocks_{i}",
                )(h, partner, emb2, kpm, train)

        out = FinalLayer(self.input_feats, name="out")(h)
        return jnp.concatenate([out[:B], out[B:]], axis=-1)
