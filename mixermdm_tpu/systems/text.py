"""Shared text-conditioning pipeline: CLIP backbone + trainable post-encoder.

Reference pattern (``/root/reference/src/models/in2in.py:109-135``,
``mixermdm.py:283-313``): frozen CLIP token features -> 2-layer trainable
encoder -> LayerNorm -> EOT-token pooling.  Tokenisation happens on the host
(outside jit); encoding is a jittable pure function of params.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from ..models.clip_text import (
    ClipTextConfig,
    ClipTextTransformer,
    default_tokenizer,
    eot_pool,
    tokenize,
)
from ..models.torch_compat import ClipPostEncoder


class TextPipeline:
    """CLIP backbone (frozen) + one or more named post-encoders.

    ``encode(params, tokens, head)`` returns the pooled (B, 768) condition for
    the given post-encoder head.
    """

    def __init__(self, clip_cfg: Optional[ClipTextConfig] = None, heads: tuple = ("default",)):
        self.clip_cfg = clip_cfg or ClipTextConfig.vit_l_14()
        self.clip = ClipTextTransformer(self.clip_cfg)
        self.heads = tuple(heads)
        self.post = {h: ClipPostEncoder(d_model=self.clip_cfg.width) for h in self.heads}
        self.tokenizer = default_tokenizer()
        # The released CLIP text towers are fp16 (the reference runs them in
        # `self.dtype` = half); bf16 on TPU matches that regime.  f32 on CPU.
        self.compute_dtype = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else None
        )

    def init_params(self, rng: jax.Array) -> dict:
        tokens = jnp.zeros((1, self.clip_cfg.context_length), jnp.int32)
        rngs = jax.random.split(rng, 1 + len(self.heads))
        params = {"clip": self.clip.init(rngs[0], tokens)["params"]}
        feats = self.clip.apply({"params": params["clip"]}, tokens)
        for i, h in enumerate(self.heads):
            params[f"post_{h}"] = self.post[h].init(rngs[1 + i], feats)["params"]
        return params

    def tokenize(self, texts: List[str], context_length: int = 77, pad_to: Optional[int] = None):
        return jnp.asarray(
            tokenize(texts, self.tokenizer, context_length=context_length, pad_to=pad_to)
        )

    def clip_features(self, params: dict, tokens) -> jnp.ndarray:
        """Frozen CLIP token features (reference runs the tower under
        ``torch.no_grad()``, mixermdm.py:296).

        The stop_gradient goes on the PARAMS, not just the output: the tower
        weights live inside the trainable "text" subtree, and tangent-
        carrying params would make JAX linearize (and remat-recompute) the
        whole 12-layer tower in every backward only to produce zero
        gradients.  On TPU the tower computes in bf16 — reference parity:
        the released OpenAI CLIP towers run fp16 (`.type(self.dtype)`,
        mixermdm.py:298).  Pallas attention measured slightly SLOWER here
        (T=77 heads are grid-overhead-bound), so the tower stays on XLA."""
        clip_params = jax.lax.stop_gradient(params["clip"])
        if self.compute_dtype is not None:
            clip_params = jax.tree_util.tree_map(
                lambda a: a.astype(self.compute_dtype)
                if a.dtype == jnp.float32 else a,
                clip_params,
            )
            feats = self.clip.apply({"params": clip_params}, tokens)
            return feats.astype(jnp.float32)
        return self.clip.apply({"params": clip_params}, tokens)

    def encode(self, params: dict, tokens, head: str = "default",
               train: bool = False, rngs=None) -> jnp.ndarray:
        feats = self.clip_features(params, tokens)
        out = self.post[head].apply(
            {"params": params[f"post_{head}"]}, feats, train=train, rngs=rngs
        )
        return eot_pool(out, tokens)

    def encode_texts(self, params: dict, texts: List[str], head: str = "default"):
        return self.encode(params, self.tokenize(texts), head)
