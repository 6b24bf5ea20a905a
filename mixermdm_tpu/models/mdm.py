"""MDM denoiser: single-person Tevet-style transformer encoder.

Parity source ``/root/reference/src/models/mdm.py``: ``MDMDenoiser``:234 —
a cond+timestep token is prepended to the motion sequence and the stack is a
stock torch ``TransformerEncoder`` (post-norm, gelu); ``InputProcess``:300 /
``OutputProcess``:313 are plain linears.

The reference adds the timestep embedding to the text condition *in place*
(``cond += self.embed_timestep(timesteps)``, mdm.py:279) — functionally here.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .embeddings import PositionalEncoding, TimestepEmbedder
from .layers import TorchLinear
from .torch_compat import TorchEncoder


class MDMDenoiser(nn.Module):
    input_feats: int
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    # NOTE: reference declares text_dim=256 (mdm.py:238) though its cond is
    # actually 512-d after ``embed_text`` — kept as metadata for the Mixer's
    # offset math (see SURVEY.md §2.4 cond-layout quirk).
    text_dim: int = 256
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, timesteps, mask=None, cond=None, train: bool = False):
        B, T, _ = x.shape

        t_emb = TimestepEmbedder(self.latent_dim, name="embed_timestep")(timesteps)
        cond_tok = (cond + t_emb)[:, None, :]  # (B, 1, D)

        h = TorchLinear(self.latent_dim, name="input_process")(x)

        if mask is None:
            m = jnp.ones((B, T))
        else:
            m = mask[..., 0] if mask.ndim == 3 else mask
        # Prepend an always-valid frame for the cond token (mdm.py:290).
        m = jnp.concatenate([jnp.ones((B, 1), m.dtype), m], axis=1)
        key_padding_mask = ~(m > 0.5)

        xseq = jnp.concatenate([cond_tok, h], axis=1)
        xseq = PositionalEncoding(self.latent_dim, name="sequence_pos_encoder")(xseq)
        out = TorchEncoder(
            self.latent_dim, self.num_heads, self.ff_size, self.num_layers,
            dropout=self.dropout, name="seqTransEncoder",
        )(xseq, key_padding_mask, train=train)[:, 1:, :]
        return TorchLinear(self.input_feats, name="output_process")(out)
