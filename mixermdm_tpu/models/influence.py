"""Influence network: predicts per-joint/per-frame mixing weights.

Parity source ``/root/reference/src/models/utils/influence.py``:
``Influence``:50 — N cross-attention blocks over (individual-model stream,
interaction-model stream) followed by a sigmoid head in 4 modes:

  1: one global scalar       (mean-pool over time -> Linear -> 1)
  2: one scalar per frame
  3: 23 weights              (22 joints + foot contact, mean-pooled over time)
  4: 23 weights per frame    (spatio-temporal; the shipped config's default,
                              ``configs/models/MixerMDM.yaml:39``)

``expand_influence`` maps the 23 weights onto the 262-d feature layout
(mixermdm.py:739-786): joints x3 -> 66, velocities reuse the joint weights,
rotations take the first 21 joints x6 -> 126, foot contact broadcast x4.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .blocks import InfluenceBlockCross
from .layers import TorchLinear, maybe_remat


class _InfluenceScanBody(nn.Module):
    latent_dim: int
    num_heads: int
    ff_size: int
    dropout: float
    train: bool

    @nn.compact
    def __call__(self, h, m_I, cond_i, cond_I, kpm):
        h = InfluenceBlockCross(
            latent_dim=self.latent_dim, num_heads=self.num_heads,
            ff_size=self.ff_size, dropout=self.dropout, name="block",
        )(h, m_I, cond_i, cond_I, kpm, self.train)
        return h, None


class Influence(nn.Module):
    input_shape: int
    n_blocks: int = 4
    n_heads: int = 8
    ff_size: int = 1024
    mode: int = 4
    dropout: float = 0.0
    scan_layers: bool = True

    @nn.compact
    def __call__(self, m_i, m_I, cond_i=None, cond_I=None, mask=None,
                 train: bool = False):
        B, T = m_i.shape[0], m_i.shape[1]

        if mask is None:
            key_padding_mask = jnp.zeros((B, T), dtype=bool)
        else:
            m = mask[..., 0] if mask.ndim == 3 else mask
            key_padding_mask = ~(m > 0.5)

        h = m_i
        if self.scan_layers:
            stack = nn.scan(
                maybe_remat(_InfluenceScanBody),
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.n_blocks,
            )(self.input_shape, self.n_heads, self.ff_size, self.dropout,
              train, name="blocks")
            h, _ = stack(h, m_I, cond_i, cond_I, key_padding_mask)
        else:
            for i in range(self.n_blocks):
                h = InfluenceBlockCross(
                    latent_dim=self.input_shape,
                    num_heads=self.n_heads,
                    ff_size=self.ff_size,
                    dropout=self.dropout,
                    name=f"blocks_{i}",
                )(h, m_I, cond_i, cond_I, key_padding_mask, train)

        if self.mode in (1, 3):
            h = h.mean(axis=1)  # global average pool over time

        out_dim = 1 if self.mode in (1, 2) else 23
        logits = TorchLinear(out_dim, name="out")(h)
        return nn.sigmoid(logits)


def expand_influence(influence: jnp.ndarray, T: int, mode: int) -> jnp.ndarray:
    """Broadcast influence weights to the (B, T, 262) feature layout.

    (mixermdm.py:739-786, all four mixing modes.)
    """
    if mode == 1:
        # (B, 1) -> (B, T, 1)
        return jnp.broadcast_to(influence[:, None, :], (influence.shape[0], T, 1))
    if mode == 2:
        # (B, T, 1) already
        return influence
    if mode == 3:
        influence = jnp.broadcast_to(
            influence[:, None, :], (influence.shape[0], T, 23)
        )
        return _expand_23(influence)
    if mode == 4:
        return _expand_23(influence)
    raise ValueError(f"unknown mixing mode {mode}")


def _expand_23(w: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 23) -> (B, T, 262): [66 pos | 66 vel | 126 rot | 4 contact]."""
    joints = jnp.repeat(w[..., :22], 3, axis=-1)        # 66
    vels = joints                                        # 66 (reuse joint weights)
    rots = jnp.repeat(w[..., :21], 6, axis=-1)           # 126
    contact = jnp.broadcast_to(w[..., 22:23], w.shape[:-1] + (4,))
    return jnp.concatenate([joints, vels, rots, contact], axis=-1)
