"""CLIP text towers in flax + tokenizer.

The reference loads OpenAI CLIP via the ``clip`` package and uses only the
*text* side: token embedding + causal pre-LN transformer + ln_final with
EOT-token pooling (``/root/reference/src/models/in2in.py:56-66,109-135``),
and for MDM the full ``encode_text`` (ViT-B/32, projection to 512 —
``mdm.py:71-121``).  Here the text transformer is a flax module whose weights
are converted from released OpenAI checkpoints
(:mod:`mixermdm_tpu.train.checkpoint`); with no checkpoint available it runs
with random weights, which keeps every pipeline end-to-end testable.

Tokenisation: :class:`ClipBPETokenizer` implements CLIP's lower-cased BPE
when a merges file is available; :class:`HashTokenizer` is a deterministic
dependency-free fallback with the same special-token layout (SOT 49406 /
EOT 49407 / zero padding), so EOT-argmax pooling behaves identically.
"""

from __future__ import annotations

import dataclasses
import gzip
import html
import os
import re
from functools import lru_cache
from typing import List, Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .layers import TorchMultiheadAttention, maybe_remat
from .torch_compat import LayerNormAffine

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408
SOT_TOKEN = 49406
EOT_TOKEN = 49407


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    width: int = 768        # ViT-L/14@336px text width
    layers: int = 12
    heads: int = 12
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    projection_dim: Optional[int] = None  # 768 for ViT-L, 512 for ViT-B/32

    @staticmethod
    def vit_l_14() -> "ClipTextConfig":
        return ClipTextConfig(width=768, layers=12, heads=12, projection_dim=768)

    @staticmethod
    def vit_b_32() -> "ClipTextConfig":
        return ClipTextConfig(width=512, layers=12, heads=8, projection_dim=512)

    @staticmethod
    def tiny(width: int = 64, layers: int = 2, heads: int = 4) -> "ClipTextConfig":
        return ClipTextConfig(width=width, layers=layers, heads=heads, projection_dim=width)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class ClipResBlock(nn.Module):
    """Pre-LN residual attention block with QuickGELU MLP."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x, attn_mask=None):
        h = LayerNormAffine(self.width, name="ln_1")(x)
        x = x + TorchMultiheadAttention(
            self.width, self.heads, add_zero_attn=False, name="attn"
        )(h, h, h, None, attn_mask)
        h = LayerNormAffine(self.width, name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="c_proj")(h)
        return x + h


class _ClipScanBody(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, causal):
        x = ClipResBlock(self.width, self.heads, name="resblock")(x, causal)
        return x, None


class ClipTextTransformer(nn.Module):
    """CLIP text encoder: returns per-token features after ln_final.

    ``__call__(tokens) -> (B, T, width)``; the reference's EOT pooling
    (``cond = out[arange(B), text.argmax(-1)]``, in2in.py:132) is
    :func:`eot_pool`.
    """

    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        B, T = tokens.shape
        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02), (c.vocab_size, c.width)
        )
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (c.context_length, c.width)
        )
        x = token_embedding[tokens] + positional_embedding[None, :T]

        causal = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)
        if getattr(c, "scan_layers", True):
            stack = nn.scan(
                maybe_remat(_ClipScanBody),
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,),
                length=c.layers,
            )(c.width, c.heads, name="resblocks")
            x, _ = stack(x, causal)
        else:
            for i in range(c.layers):
                x = ClipResBlock(c.width, c.heads, name=f"resblocks_{i}")(x, causal)
        return LayerNormAffine(c.width, name="ln_final")(x)


class ClipTextEncoder(nn.Module):
    """Full ``encode_text``: EOT pooling + text projection (for MDM/InterCLIP)."""

    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, tokens):
        feats = ClipTextTransformer(self.cfg, name="transformer")(tokens)
        pooled = eot_pool(feats, tokens)
        proj_dim = self.cfg.projection_dim or self.cfg.width
        projection = self.param(
            "text_projection", nn.initializers.normal(self.cfg.width**-0.5),
            (self.cfg.width, proj_dim),
        )
        return pooled @ projection


def eot_pool(feats: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Select the EOT-token feature per sequence (tokens.argmax, since EOT has
    the highest id)."""
    idx = tokens.argmax(axis=-1)
    return jnp.take_along_axis(feats, idx[:, None, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------


@lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class ClipBPETokenizer:
    """CLIP's byte-pair tokenizer, loading the standard merges file.

    Accepts either the OpenAI ``bpe_simple_vocab_16e6.txt.gz`` or a plain
    merges.txt.  Raises ``FileNotFoundError`` if no vocab asset exists — use
    :class:`HashTokenizer` in asset-free environments.
    """

    def __init__(self, bpe_path: str):
        if not os.path.exists(bpe_path):
            raise FileNotFoundError(bpe_path)
        if bpe_path.endswith(".gz"):
            with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
                merges = f.read().split("\n")
            merges = merges[1 : 49152 - 256 - 2 + 1]
        else:
            with open(bpe_path, encoding="utf-8") as f:
                merges = [l for l in f.read().split("\n") if l and not l.startswith("#")]
        merges = [tuple(m.split()) for m in merges]

        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
            if False
            else r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
            re.IGNORECASE,
        )

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)

        def get_pairs(word):
            return set(zip(word[:-1], word[1:]))

        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = _whitespace_clean(_basic_clean(text)).lower()
        bpe_tokens: List[int] = []
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return bpe_tokens


class HashTokenizer:
    """Deterministic fallback tokenizer (no vocab assets required).

    One token per whitespace word, id = stable hash into the BPE id range.
    Keeps SOT/EOT/padding layout identical to CLIP so EOT-argmax pooling and
    padding masks behave the same.  NOT compatible with released CLIP
    checkpoints — use :class:`ClipBPETokenizer` with real assets for parity.
    """

    def encode(self, text: str) -> List[int]:
        import hashlib

        words = _whitespace_clean(_basic_clean(text)).lower().split(" ")
        ids = []
        for w in words:
            if not w:
                continue
            h = int.from_bytes(hashlib.sha256(w.encode()).digest()[:4], "little")
            ids.append(1 + h % (SOT_TOKEN - 1))
        return ids


_DEFAULT_BPE_CANDIDATES = (
    "data/bpe_simple_vocab_16e6.txt.gz",
    os.path.expanduser("~/.cache/clip/bpe_simple_vocab_16e6.txt.gz"),
)


def default_tokenizer(bpe_path: Optional[str] = None):
    """Best available tokenizer: BPE if assets exist, else the hash fallback."""
    candidates = [bpe_path] if bpe_path else list(_DEFAULT_BPE_CANDIDATES)
    for c in candidates:
        if c and os.path.exists(c):
            return ClipBPETokenizer(c)
    return HashTokenizer()


def tokenize(
    texts: List[str],
    tokenizer=None,
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = True,
    pad_to: Optional[int] = None,
) -> np.ndarray:
    """Batch-encode texts to int32 (B, pad_to or context_length).

    Matches ``clip.tokenize`` semantics, including MDM's 22-token context
    with zero-padding back to 77 (mdm.py:104-112) via ``context_length=22,
    pad_to=77``.
    """
    tokenizer = tokenizer or default_tokenizer()
    out_len = pad_to or context_length
    result = np.zeros((len(texts), out_len), dtype=np.int32)
    for i, text in enumerate(texts):
        ids = [SOT_TOKEN] + tokenizer.encode(text) + [EOT_TOKEN]
        if len(ids) > context_length:
            if not truncate:
                raise ValueError(f"text too long: {text!r}")
            ids = ids[: context_length - 1] + [EOT_TOKEN]
        result[i, : len(ids)] = ids
    return result
