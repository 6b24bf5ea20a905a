"""Transformer blocks used by denoisers / discriminators / influence net.

Parity source ``/root/reference/src/models/utils/blocks.py``:
``TransformerBlock``:3, ``TransformerBlockDoubleCond``:30,
``TransformerBlockSimple``:66; and ``influence.py``:
``InfluenceBlockCross``:6.

All blocks are residual: SA -> (CA) -> FFN with AdaLN conditioning.  The
"double cond" variant conditions self-attention/FFN on the *individual*
embedding and cross-attention on the *interaction* embedding; individual
modes skip cross-attention entirely (blocks.py:54-58) — here that choice is a
static Python flag, so each mode jit-compiles its own specialised program.

The residual adds ride ``residual=True`` *inside* the sub-layers: same math
as the reference's ``x + block(x)``, but on the Pallas fused path the add
happens in-VMEM, saving one HBM pass over (B, T, E) per sub-layer.
"""

from __future__ import annotations

import flax.linen as nn

from .layers import FFN, VanillaCrossAttention, VanillaSelfAttention, seq_constraint


class TransformerBlock(nn.Module):
    """SA -> CA(partner stream) -> FFN (InterGen style, blocks.py:3-28)."""

    latent_dim: int = 512
    num_heads: int = 8
    ff_size: int = 1024
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, y, emb=None, key_padding_mask=None, train: bool = False):
        h1 = seq_constraint(
            VanillaSelfAttention(self.latent_dim, self.num_heads, self.dropout,
                                 name="sa_block")(x, emb, key_padding_mask, train,
                                                  residual=True))
        h2 = seq_constraint(VanillaCrossAttention(
            self.latent_dim, self.latent_dim, self.num_heads, self.dropout,
            name="ca_block",
        )(h1, y, emb, key_padding_mask, train, residual=True))
        return seq_constraint(
            FFN(self.latent_dim, self.ff_size, self.dropout, name="ffn")(
                h2, emb, train, residual=True
            ))


class TransformerBlockDoubleCond(nn.Module):
    """in2IN block with separate individual/interaction conds (blocks.py:30-63)."""

    mode: str  # "individual" | "interaction" | "dual_individual" | "dual_interaction"
    latent_dim: int = 512
    num_heads: int = 8
    ff_size: int = 1024
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, y, emb=None, emb_interaction=None, key_padding_mask=None,
                 train: bool = False):
        h1 = seq_constraint(
            VanillaSelfAttention(self.latent_dim, self.num_heads, self.dropout,
                                 name="sa_block")(x, emb, key_padding_mask, train,
                                                  residual=True))
        if self.mode in ("individual", "dual_individual"):
            h2 = h1
        else:
            h2 = seq_constraint(VanillaCrossAttention(
                self.latent_dim, self.latent_dim, self.num_heads, self.dropout,
                name="ca_block",
            )(h1, y, emb_interaction, key_padding_mask, train, residual=True))
        return seq_constraint(
            FFN(self.latent_dim, self.ff_size, self.dropout, name="ffn")(
                h2, emb, train, residual=True
            ))

    @staticmethod
    def has_cross_attention(mode: str) -> bool:
        return mode not in ("individual", "dual_individual")


class TransformerBlockSimple(nn.Module):
    """SA -> FFN, used by discriminators (blocks.py:66-89)."""

    latent_dim: int = 512
    num_heads: int = 8
    ff_size: int = 1024
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb=None, key_padding_mask=None, train: bool = False):
        h1 = seq_constraint(
            VanillaSelfAttention(self.latent_dim, self.num_heads, self.dropout,
                                 name="sa_block")(x, emb, key_padding_mask, train,
                                                  residual=True))
        return seq_constraint(
            FFN(self.latent_dim, self.ff_size, self.dropout, name="ffn")(
                h1, emb, train, residual=True
            ))


class InfluenceBlockCross(nn.Module):
    """SA(individual, cond_i) -> CA(-> interaction, cond_I) -> FFN(cond_I)
    (influence.py:6-48)."""

    latent_dim: int = 512
    num_heads: int = 8
    ff_size: int = 1024
    dropout: float = 0.0

    @nn.compact
    def __call__(self, m_i, m_I, emb_i=None, emb_I=None, key_padding_mask=None,
                 train: bool = False):
        h1 = seq_constraint(
            VanillaSelfAttention(self.latent_dim, self.num_heads, self.dropout,
                                 name="sa_block")(m_i, emb_i, key_padding_mask, train,
                                                  residual=True))
        h2 = seq_constraint(VanillaCrossAttention(
            self.latent_dim, self.latent_dim, self.num_heads, self.dropout,
            name="ca_block",
        )(h1, m_I, emb_I, key_padding_mask, train, residual=True))
        return seq_constraint(
            FFN(self.latent_dim, self.ff_size, self.dropout, name="ffn")(
                h2, emb_I, train, residual=True
            ))
