"""Tokenizer tests: CLIP BPE (synthetic merges) + hash fallback."""

import numpy as np
import pytest

from mixermdm_tpu.models.clip_text import (
    CONTEXT_LENGTH,
    EOT_TOKEN,
    SOT_TOKEN,
    ClipBPETokenizer,
    HashTokenizer,
    tokenize,
)


@pytest.fixture()
def bpe(tmp_path):
    # Minimal merges file: enough to merge "he", "hell", "hello</w>" style pairs.
    merges = [
        "h e",
        "he l",
        "hel l",
        "hell o</w>",
        "w o",
        "wo r",
        "wor l",
        "worl d</w>",
    ]
    path = tmp_path / "merges.txt"
    path.write_text("\n".join(merges) + "\n")
    return ClipBPETokenizer(str(path))


class TestBPE:
    def test_merges_applied(self, bpe):
        ids = bpe.encode("hello world")
        # Both words fully merge to single tokens.
        assert len(ids) == 2
        assert ids[0] == bpe.encoder["hello</w>"]
        assert ids[1] == bpe.encoder["world</w>"]

    def test_unknown_word_falls_to_bytes(self, bpe):
        ids = bpe.encode("xyz")
        assert len(ids) == 3  # x, y, z</w> (no merges defined)

    def test_case_and_whitespace_normalised(self, bpe):
        assert bpe.encode("  HELLO   world ") == bpe.encode("hello world")


class TestHashTokenizer:
    def test_deterministic(self):
        t = HashTokenizer()
        assert t.encode("a person walks") == t.encode("a person walks")
        assert t.encode("walks") != t.encode("runs")

    def test_ids_below_sot(self):
        ids = HashTokenizer().encode("some words here")
        assert all(0 < i < SOT_TOKEN for i in ids)


class TestTokenizeBatch:
    def test_layout(self):
        toks = tokenize(["hi there", "a"], HashTokenizer())
        assert toks.shape == (2, CONTEXT_LENGTH)
        assert toks[0, 0] == SOT_TOKEN
        assert EOT_TOKEN in toks[0]
        # Padding zeros after EOT.
        eot_pos = int(np.argmax(toks[1]))
        assert (toks[1, eot_pos + 1 :] == 0).all()

    def test_eot_is_argmax(self):
        toks = tokenize(["some words"], HashTokenizer())
        assert toks[0, int(np.argmax(toks[0]))] == EOT_TOKEN

    def test_truncation(self):
        long = " ".join(["word"] * 200)
        toks = tokenize([long], HashTokenizer())
        assert toks.shape == (1, CONTEXT_LENGTH)
        assert toks[0, -1] == EOT_TOKEN

    def test_mdm_pad_layout(self):
        toks = tokenize(["hi"], HashTokenizer(), context_length=22, pad_to=77)
        assert toks.shape == (1, 77)
        assert (toks[0, 22:] == 0).all()
