"""in2IN denoiser: dual-stream transformer with individual+interaction conds.

Parity source ``/root/reference/src/models/in2in.py``: ``in2INDenoiser``:358
(modes ``individual`` / ``interaction`` / ``dual_individual`` /
``dual_interaction``), cond slicing :414-424, weight-shared person streams
:437-452.

TPU-first re-design: the reference calls each block twice per layer (person a,
person b) with shared weights.  Here the two person streams are *stacked into
the batch axis* so every attention/matmul runs at 2B batch on the MXU — one
kernel launch per layer instead of two, and the partner stream for
cross-attention is obtained by flipping the stacked halves (a zero-copy
gather).  Conditioning embeddings are stacked the same way.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .blocks import TransformerBlockDoubleCond
from .embeddings import PositionalEncoding, TimestepEmbedder
from .layers import FinalLayer, TorchLinear, maybe_remat
from ..parallel.pipeline import pipeline_context, pipeline_scan


class _DoubleCondScanBody(nn.Module):
    """nn.scan body wrapping one TransformerBlockDoubleCond.

    Carry = hidden state (possibly person-stacked at 2B); the cross-person
    partner is the swapped half of the carry, recomputed per layer.
    """

    mode: str
    latent_dim: int
    num_heads: int
    ff_size: int
    dropout: float
    swap_half: int      # 0 = no partner; else B (swap the stacked halves)
    train: bool

    @nn.compact
    def __call__(self, h, emb, emb_inter, kpm):
        partner = (
            None if not self.swap_half
            else jnp.concatenate([h[self.swap_half:], h[: self.swap_half]], axis=0)
        )
        h = TransformerBlockDoubleCond(
            mode=self.mode, latent_dim=self.latent_dim, num_heads=self.num_heads,
            ff_size=self.ff_size, dropout=self.dropout, name="block",
        )(h, partner, emb, emb_inter, kpm, self.train)
        return h, None


class In2INDenoiser(nn.Module):
    """Text-conditioned motion denoiser (in2in.py:358-463).

    ``mode`` is static:
      * ``individual``:       x is (B, T, F), cond is (B, 768).
      * ``interaction``:      x is (B, T, 2F), cond is (B, 3*768)
                              ordered [I, i1, i2].
      * ``dual_individual``:  x is (B, T, 2F), cond is (B, 5*768) and the
                              denoiser reads slices [3], [4] (in2in.py:419).
      * ``dual_interaction``: x is (B, T, 2F), cond slices [0],[1],[2].
    """

    input_feats: int
    mode: str
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    text_dim: int = 768
    dropout: float = 0.0
    # nn.scan over layers: one compiled block body instead of num_layers
    # unrolled copies — ~8x less trace/compile work; params stack under
    # "blocks" with a leading layer axis (converters handle both layouts).
    scan_layers: bool = True

    @nn.compact
    def __call__(self, x, timesteps, mask=None, cond=None, train: bool = False):
        B, T = x.shape[0], x.shape[1]
        single = self.mode == "individual"
        td = self.text_dim

        t_emb = TimestepEmbedder(self.latent_dim, name="embed_timestep")(timesteps)
        text_embed = TorchLinear(self.latent_dim, name="text_embed")
        motion_embed = TorchLinear(self.latent_dim, name="motion_embed")
        pos_enc = PositionalEncoding(self.latent_dim, name="sequence_pos_encoder")

        if self.mode in ("interaction", "dual_interaction"):
            emb_inter = t_emb + text_embed(cond[:, :td])
            emb_i1 = t_emb + text_embed(cond[:, td : 2 * td])
            emb_i2 = t_emb + text_embed(cond[:, 2 * td : 3 * td])
        elif self.mode == "dual_individual":
            emb_inter = None
            emb_i1 = t_emb + text_embed(cond[:, 3 * td : 4 * td])
            emb_i2 = t_emb + text_embed(cond[:, 4 * td : 5 * td])
        elif single:
            emb_inter = None
            emb_i1 = t_emb + text_embed(cond[:, :td])
            emb_i2 = None
        else:
            raise ValueError(f"unknown mode {self.mode}")

        if mask is None:
            key_padding_mask = jnp.zeros((B, T), dtype=bool)
        else:
            m = mask[..., 0] if mask.ndim == 3 else mask
            key_padding_mask = ~(m > 0.5)

        final = FinalLayer(self.input_feats, name="out")
        block_kw = dict(
            mode=self.mode, latent_dim=self.latent_dim, num_heads=self.num_heads,
            ff_size=self.ff_size, dropout=self.dropout,
        )

        def run_stack(h, swap_half, emb, emb_inter, kpm):
            """All layers, either nn.scan'ed (one compiled body) or unrolled.

            ``swap_half``: nonzero B for the cross-person partner swap.
            """
            pp = pipeline_context()
            if (
                pp is not None
                and self.scan_layers
                and not self.is_initializing()
                and (not train or self.dropout == 0.0)
                and self._can_pipeline(pp, h.shape[0], swap_half)
            ):
                return self._pipelined_stack(
                    h, swap_half, emb, emb_inter, kpm, pp, block_kw, train
                )
            if self.scan_layers:
                stack = nn.scan(
                    maybe_remat(_DoubleCondScanBody),
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                    length=self.num_layers,
                )(
                    mode=self.mode, latent_dim=self.latent_dim,
                    num_heads=self.num_heads, ff_size=self.ff_size,
                    dropout=self.dropout, swap_half=swap_half, train=train,
                    name="blocks",
                )
                h, _ = stack(h, emb, emb_inter if emb_inter is not None else emb, kpm)
                return h
            for i in range(self.num_layers):
                block = TransformerBlockDoubleCond(**block_kw, name=f"blocks_{i}")
                partner = (
                    None if not swap_half
                    else jnp.concatenate([h[swap_half:], h[:swap_half]], axis=0)
                )
                h = block(h, partner, emb, emb_inter, kpm, train)
            return h

        if single:
            h = pos_enc(motion_embed(x[..., : self.input_feats]))
            h = run_stack(h, 0, emb_i1, None, key_padding_mask)
            return final(h)

        x_a = x[..., : self.input_feats]
        x_b = x[..., self.input_feats :]

        if self.mode == "dual_individual":
            # Reference quirk (in2in.py:441-452): in dual_individual mode
            # ``h_b_prev`` is never updated, so person b's output is only the
            # LAST block applied to the raw embedding while person a runs the
            # full stack.  Reproduced faithfully for DualMDM checkpoint parity.
            # (Always unrolled: person b needs just the last block's params.)
            blocks = [
                TransformerBlockDoubleCond(**block_kw, name=f"blocks_{i}")
                for i in range(self.num_layers)
            ]
            h_a = pos_enc(motion_embed(x_a))
            h_b0 = pos_enc(motion_embed(x_b))
            for block in blocks:
                h_a = block(h_a, None, emb_i1, None, key_padding_mask, train)
            h_b = blocks[-1](h_b0, None, emb_i2, None, key_padding_mask, train)
            return jnp.concatenate([final(h_a), final(h_b)], axis=-1)

        # interaction / dual_interaction: stack person streams into the batch
        # axis — (2B, T, D) — so every matmul runs at double batch on the MXU
        # (reference runs each block twice with shared weights, in2in.py:439-440).
        h = pos_enc(motion_embed(jnp.concatenate([x_a, x_b], axis=0)))
        emb = jnp.concatenate([emb_i1, emb_i2], axis=0)
        emb_inter2 = jnp.concatenate([emb_inter, emb_inter], axis=0)
        kpm = jnp.concatenate([key_padding_mask, key_padding_mask], axis=0)
        h = run_stack(h, B, emb, emb_inter2, kpm)
        out = final(h)
        return jnp.concatenate([out[:B], out[B:]], axis=-1)

    def _can_pipeline(self, pp, rows, swap_half):
        """Whether this stack can run as a GPipe pipeline under ``pp``.

        Stacks that don't divide over the stages (e.g. a 1-layer tiny-config
        denoiser on a 2-stage mesh) or whose batch can't microbatch evenly
        fall back to the sequential ``nn.scan`` — ``--pp`` pipelines every
        stack it can and leaves the rest untouched.
        """
        mesh, axis, n_microbatches = pp
        n_stages = mesh.shape[axis]
        M = n_microbatches or n_stages
        if self.num_layers % n_stages:
            return False
        if rows % M or (swap_half and (rows // M) % 2):
            return False
        return True

    def _pipelined_stack(self, h, swap_half, emb, emb_inter, kpm, pp,
                         block_kw, train):
        """The layer stack as a GPipe pipeline (``parallel.pipeline_scan``).

        Activated by ``parallel.pipeline_scope`` (the ``--pp`` CLI flag) at
        apply time; parameter creation always goes through the sequential
        ``nn.scan`` path, so checkpoints are layout-identical.

        The cross-person partner swap needs both persons of a sample in the
        SAME microbatch: the person-stacked ``[a0..aB-1, b0..bB-1]`` rows are
        re-ordered pair-major ``[a0, b0, a1, b1, ...]`` going in, the swap
        becomes a within-pair flip, and the output is de-interleaved — the
        math is identical to the sequential half-swap (asserted in
        tests/test_parallel.py).
        """
        mesh, axis, n_microbatches = pp
        stacked = self.variables["params"]["blocks"]
        block = TransformerBlockDoubleCond(**block_kw, name=None)
        interleave = bool(swap_half)
        if emb_inter is None:
            emb_inter = emb

        rows = h.shape[0]
        M = n_microbatches or mesh.shape[axis]
        if rows % M or (interleave and (rows // M) % 2):
            raise ValueError(
                f"--pp: the {rows}-row person-stacked batch must split into "
                f"{M} microbatches of even size"
            )

        if interleave:
            B = swap_half

            def il(a):
                return jnp.stack([a[:B], a[B:]], axis=1).reshape(
                    (2 * B,) + a.shape[1:]
                )

            h, emb, emb_inter, kpm = il(h), il(emb), il(emb_inter), il(kpm)

        def body(lp, carry):
            hh, e, ei, m = carry
            partner = None
            if interleave:
                pr = hh.reshape((-1, 2) + hh.shape[1:])
                partner = pr[:, ::-1].reshape(hh.shape)
            hh = block.apply({"params": lp["block"]}, hh, partner, e, ei, m, train)
            return (hh, e, ei, m)

        out = pipeline_scan(
            body, stacked, (h, emb, emb_inter, kpm), mesh,
            axis=axis, n_microbatches=M,
        )[0]
        if interleave:
            d = out.reshape((B, 2) + out.shape[1:])
            out = jnp.concatenate([d[:, 0], d[:, 1]], axis=0)
        return out
