"""InterCLIP: contrastive motion<->text feature extractor (the FID backbone).

Parity source ``/root/reference/src/evaluation/models.py``:
``MotionEncoder``:7-80 (query-token transformer over motion, contact dims
dropped), ``InterCLIP``:82-252 (text tower = frozen CLIP token+positional
embedding -> 8-layer trainable encoder -> LN -> Linear(768->512); learnable
``latent_scale`` temperature; symmetric CE loss).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import Config
from ..models.clip_text import VOCAB_SIZE, CONTEXT_LENGTH, default_tokenizer, eot_pool, tokenize
from ..models.embeddings import PositionalEncoding
from ..models.torch_compat import LayerNormAffine, TorchEncoder


class MotionEncoder(nn.Module):
    """Query-token transformer -> 512-d motion embedding (models.py:7-80)."""

    input_feats: int = 258      # 262 - 4 contact dims (dropped at :60-62)
    latent_dim: int = 1024
    ff_size: int = 2048
    num_layers: int = 8
    num_heads: int = 8
    mode: str = "interaction"   # "interaction" doubles the feature dim

    @nn.compact
    def __call__(self, motions, mask):
        B, T, D = motions.shape
        if self.mode == "interaction":
            x = motions.reshape(B, T, 2, -1)[..., :-4].reshape(B, T, -1)
        else:
            x = motions[..., :-4]

        x_emb = nn.Dense(self.latent_dim, name="embed_motion")(x)
        query = self.param(
            "query_token", nn.initializers.normal(1.0), (1, self.latent_dim)
        )
        emb = jnp.concatenate(
            [jnp.broadcast_to(query[None], (B, 1, self.latent_dim)), x_emb], axis=1
        )

        valid = jnp.concatenate(
            [jnp.ones((B, 1), bool), mask > 0.5], axis=1
        )
        h = PositionalEncoding(self.latent_dim, max_len=2000, name="sequence_pos_encoder")(emb)
        h = TorchEncoder(
            self.latent_dim, self.num_heads, self.ff_size, self.num_layers,
            name="transformer",
        )(h, ~valid)
        h = LayerNormAffine(self.latent_dim, name="out_ln")(h)
        return nn.Dense(512, name="out")(h[:, 0])


class InterCLIP:
    """Full evaluator model: motion tower + text tower + temperature."""

    def __init__(self, cfg: Optional[Config] = None, text_width: int = 768):
        cfg = cfg or Config.wrap(
            {
                "INPUT_DIM": 258, "LATENT_DIM": 1024, "FF_SIZE": 2048,
                "NUM_LAYERS": 8, "NUM_HEADS": 8, "DROPOUT": 0.1,
                "MODE": "interaction",
            }
        )
        self.cfg = cfg
        self.mode = cfg.get("MODE", "interaction")
        self.text_width = text_width
        self.motion_encoder = MotionEncoder(
            input_feats=int(cfg.INPUT_DIM),
            latent_dim=int(cfg.LATENT_DIM),
            ff_size=int(cfg.FF_SIZE),
            num_layers=int(cfg.NUM_LAYERS),
            num_heads=int(cfg.NUM_HEADS),
            mode=self.mode,
        )
        self.text_encoder = TorchEncoder(text_width, 8, int(cfg.FF_SIZE), 8)
        self.tokenizer = default_tokenizer()
        self._jit_motion = None
        self._jit_text = None

    def init_params(self, rng) -> dict:
        r = jax.random.split(rng, 4)
        F = int(self.cfg.INPUT_DIM) + 4
        D = 2 * F if self.mode == "interaction" else F
        motions = jnp.zeros((1, 8, D))
        mask = jnp.ones((1, 8))
        params = {
            "motion_encoder": self.motion_encoder.init(r[0], motions, mask)["params"],
            "token_embedding": jax.random.normal(r[1], (VOCAB_SIZE, self.text_width)) * 0.02,
            "positional_embedding": jax.random.normal(r[2], (CONTEXT_LENGTH, self.text_width)) * 0.01,
            "latent_scale": jnp.ones(()),
        }
        tokens_emb = jnp.zeros((1, CONTEXT_LENGTH, self.text_width))
        params["text_encoder"] = self.text_encoder.init(r[3], tokens_emb)["params"]
        params["text_ln"] = {"scale": jnp.ones((self.text_width,)), "bias": jnp.zeros((self.text_width,))}
        params["text_out"] = {
            "kernel": jax.random.normal(jax.random.fold_in(rng, 9),
                                        (self.text_width, 512)) * 0.02,
            "bias": jnp.zeros((512,)),
        }
        return params

    # ------------------------------------------------------------- encoders
    # Both encoders are lazily jitted: the eval protocol calls them once per
    # batch in host loops, and eager per-op dispatch over a device tunnel
    # costs seconds per call vs milliseconds compiled (the same fix as the
    # systems' cond encoders).  The evaluator trainer's jitted loss inlines
    # the impl functions.
    def encode_motion(self, params, motions, motion_lens):
        if not hasattr(self, "_jit_enc_motion"):
            self._jit_enc_motion = jax.jit(self._encode_motion_impl)
        return self._jit_enc_motion(params, motions, motion_lens)

    def _encode_motion_impl(self, params, motions, motion_lens):
        """(B, T, D) raw motions + lengths -> normalised 512-d embeddings
        scaled by latent_scale (models.py:144-154)."""
        B, T = motions.shape[:2]
        mask = (jnp.arange(T)[None, :] < motion_lens[:, None]).astype(jnp.float32)
        emb = self.motion_encoder.apply(
            {"params": params["motion_encoder"]}, motions, mask
        )
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb * params["latent_scale"]

    def encode_text_tokens(self, params, tokens):
        if not hasattr(self, "_jit_enc_text"):
            self._jit_enc_text = jax.jit(self._encode_text_tokens_impl)
        return self._jit_enc_text(params, tokens)

    def _encode_text_tokens_impl(self, params, tokens):
        """Tokens -> normalised 512-d text embeddings (models.py:156-180)."""
        x = jax.lax.stop_gradient(
            params["token_embedding"][tokens] + params["positional_embedding"][None]
        )
        out = self.text_encoder.apply({"params": params["text_encoder"]}, x)
        ln = params["text_ln"]
        mean = out.mean(-1, keepdims=True)
        var = ((out - mean) ** 2).mean(-1, keepdims=True)
        out = (out - mean) / jnp.sqrt(var + 1e-5) * ln["scale"] + ln["bias"]
        pooled = eot_pool(out, tokens)
        pooled = pooled @ params["text_out"]["kernel"] + params["text_out"]["bias"]
        pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return pooled * params["latent_scale"]

    def encode_text(self, params, texts):
        tokens = jnp.asarray(tokenize(texts, self.tokenizer))
        return self.encode_text_tokens(params, tokens)

    # ----------------------------------------------------------------- loss
    def compute_loss(self, params, motions, motion_lens, tokens):
        """Symmetric CE CLIP loss (models.py:203-242)."""
        text_emb = self.encode_text_tokens(params, tokens)
        motion_emb = self.encode_motion(params, motions, motion_lens)

        t_norm = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)
        m_norm = motion_emb / jnp.linalg.norm(motion_emb, axis=-1, keepdims=True)
        logit_scale = params["latent_scale"] ** 2
        logits_m = logit_scale * m_norm @ t_norm.T
        logits_t = logits_m.T
        B = motions.shape[0]
        labels = jnp.arange(B)

        def ce(logits):
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

        loss = (ce(logits_m) + ce(logits_t)) / 2.0
        return loss, {
            "total": loss,
            "ce_from_motion": ce(logits_m),
            "ce_from_text": ce(logits_t),
        }
