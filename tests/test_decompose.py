"""Interaction-text decomposition (offline stand-in for the reference's
gpt-4o-mini splitter, /root/reference/src/evaluation/datasets.py:32-96)."""

from mixermdm_tpu.eval.decompose import (
    decompose_interaction_text,
    get_decomposer,
    heuristic_text_decomposer,
)


class TestHeuristicDecomposer:
    def test_reference_one_shot_example(self):
        """The reference prompt's own worked example splits correctly."""
        t1, t2 = decompose_interaction_text(
            "In an intense boxing match, one person attacks the opponent "
            "with straight punch, and then the opponent falls over."
        )
        assert "attacks the other person" in t1 and "falls over" not in t1
        assert "falls over" in t2 and "attacks" not in t2
        assert t1.startswith("one person") and t2.startswith("one person")

    def test_while_split(self):
        t1, t2 = decompose_interaction_text(
            "one person raises the right hand and waves while the other "
            "person claps."
        )
        assert "waves" in t1 and "claps" not in t1
        assert "claps" in t2 and "waves" not in t2

    def test_relative_clause_flips_person(self):
        t1, t2 = decompose_interaction_text(
            "one person pushes the other, who stumbles back."
        )
        assert "pushes" in t1 and "stumbles" not in t1
        assert "stumbles back" in t2 and "pushes" not in t2

    def test_second_person_first(self):
        t1, t2 = decompose_interaction_text(
            "the second person kicks, and the first person blocks with both arms."
        )
        assert "blocks" in t1 and "kicks" not in t1
        assert "kicks" in t2 and "blocks" not in t2

    def test_each_other_normalised(self):
        t1, _ = decompose_interaction_text(
            "one person hugs each other tightly while the other person laughs."
        )
        assert "each other" not in t1 and "the other person" in t1

    def test_identity_fallback_when_nothing_person_specific(self):
        text = "two people bow to each other."
        assert decompose_interaction_text(text) == (text, text)

    def test_batch_hook_signature(self):
        texts = ["one person waves while the other person bows.",
                 "they dance together."]
        t1, t2 = heuristic_text_decomposer(texts)
        assert len(t1) == len(t2) == 2
        assert "waves" in t1[0] and "bows" in t2[0]
        assert t1[1] == t2[1] == texts[1]

    def test_get_decomposer(self):
        import pytest

        assert get_decomposer("heuristic") is heuristic_text_decomposer
        ident = get_decomposer("identity")
        assert ident(["a"]) == (["a"], ["a"])
        with pytest.raises(ValueError):
            get_decomposer("gpt")


def test_generate_batches_decomposer_override():
    """text_decomposer on the eval driver OVERRIDES dataset individual texts
    (the reference's llm=True behaviour)."""
    import numpy as np

    from mixermdm_tpu.eval.driver import generate_batches

    class TinySystem:
        def generate_cond(self, params, batch):
            return np.zeros((len(batch["text"]), 4), np.float32)

        def sample(self, params, cond, T, rng, **kw):
            return np.zeros((cond.shape[0], T, 6), np.float32)

    class TinyDataset:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {
                "name": f"n{i}",
                "text": "one person waves while the other person bows.",
                "text_individual1": "dataset t1",
                "text_individual2": "dataset t2",
                "motion1": np.zeros((8, 3), np.float32),
                "motion2": np.zeros((8, 3), np.float32),
                "motion_lens": 8,
            }

    import jax

    _, _, ind = generate_batches(
        TinySystem(), {}, TinyDataset(), jax.random.PRNGKey(0),
        num_samples=2, batch_size=2, per_item=False,
        text_decomposer=heuristic_text_decomposer,
    )
    (t1s, t2s), = ind
    assert "waves" in t1s[0] and "bows" in t2s[0]
    _, _, ind = generate_batches(
        TinySystem(), {}, TinyDataset(), jax.random.PRNGKey(0),
        num_samples=2, batch_size=2, per_item=False,
    )
    assert ind[0][0][0] == "dataset t1"
