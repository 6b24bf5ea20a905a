"""Positional and timestep embeddings.

Parity source ``/root/reference/src/models/utils/utils.py``:
``PositionalEncoding``:24, ``TimestepEmbedder``:41.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from jax.nn import silu

from .layers import TorchLinear


def sinusoidal_table(max_len: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """The classic sin/cos table, identical to the reference buffer ``pe``."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype)


class PositionalEncoding(nn.Module):
    """Adds the sinusoidal table to a (B, T, D) sequence (utils.py:24-39)."""

    d_model: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, x):
        pe = sinusoidal_table(self.max_len, self.d_model, x.dtype)
        return x + pe[None, : x.shape[1], :]


class TimestepEmbedder(nn.Module):
    """MLP(SiLU) over pe[t] (utils.py:41-55). Returns (B, D)."""

    latent_dim: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, timesteps):
        pe = sinusoidal_table(self.max_len, self.latent_dim)
        h = pe[timesteps]
        h = TorchLinear(self.latent_dim, name="linear1")(h)
        h = silu(h)
        return TorchLinear(self.latent_dim, name="linear2")(h)


class IdentityEmbedder(nn.Module):
    """TimestepEmbedder variant returning (B, 1, D) (utils.py:58-72)."""

    latent_dim: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, timesteps):
        emb = TimestepEmbedder(self.latent_dim, self.max_len, name="time_embed")(timesteps)
        return emb[:, None, :]
