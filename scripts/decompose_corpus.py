"""Corpus-level measurement of the heuristic text decomposer (VERDICT r4 #7).

The reference decomposes interaction captions with gpt-4o-mini
(``/root/reference/src/evaluation/datasets.py:32-96``); our offline stand-in
is ``eval/decompose.py``.  Its unit tests prove individual behaviours — this
script measures the two corpus-level numbers that pick the eval default:

* **fire-rate** — on how many captions does it produce a non-identity
  decomposition (the identity fallback is the reference's non-LLM path, so
  firing is only an upgrade when the assignment is right);
* **subject accuracy** — for every hand-labelled action keyword, does it
  land in the RIGHT person's output (and, for person-specific actions, stay
  OUT of the other person's)?

Corpus: 50 hand-written captions in the InterHuman register (compare the
reference's one-shot example, datasets.py:48-60: "In an intense boxing
match, one person is moving around ... while the other person ...") with
per-person keyword labels.  ``both`` keywords must appear in BOTH outputs.

Run: python scripts/decompose_corpus.py  -> decompose_corpus.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (caption, p1_keywords, p2_keywords, both_keywords)
# Labels mark which person performs which action; keyword matching is
# case-insensitive substring on the decomposed outputs.
CORPUS = [
    # -- classic "one ... while the other ..." pairs ---------------------
    ("one person throws a punch while the other person dodges to the side",
     ["punch"], ["dodge"], []),
    ("one person waves his hand and the other person bows politely",
     ["wave"], ["bow"], []),
    ("one person pushes the other, who stumbles backwards",
     ["push"], ["stumble"], []),
    ("in an intense boxing match, one person is moving around and throws a "
     "punch, while the other person falls over and stays on the ground",
     ["punch"], ["falls over"], []),
    ("one person kicks high while the other person blocks with both arms",
     ["kick"], ["block"], []),
    ("one person hands over a box and the other person takes it with both "
     "hands", ["hands over"], ["takes"], []),
    ("the first person walks forward while the second person retreats",
     ["walks forward"], ["retreat"], []),
    ("one person chases the other person around in a circle",
     ["chase"], [], []),
    ("one person points at the sky and the other person looks up",
     ["point"], ["looks up"], []),
    ("one person kneels down while the other person stands still",
     ["kneel"], ["stands still"], []),
    # -- pronoun continuation -------------------------------------------
    ("one person raises a sword, then he swings it downward, while the "
     "other person jumps away", ["swing"], ["jump"], []),
    ("one person crouches and then he leaps forward as the other person "
     "sidesteps", ["leap"], ["sidestep"], []),
    # -- "who" relative clauses -----------------------------------------
    ("one person throws a ball to the other person, who catches it",
     ["throw"], ["catch"], []),
    ("the first person trips the second person, who falls to the floor",
     ["trip"], ["fall"], []),
    # -- both-person actions --------------------------------------------
    ("two people shake hands and then both raise their arms",
     [], [], ["shake hands", "raise"]),
    ("both people dance together, spinning in circles",
     [], [], ["danc", "spinning"]),
    ("the two walk side by side, then one person stops and the other "
     "person keeps walking", ["stop"], ["keeps walking"], ["side by side"]),
    ("they hug each other tightly and then step apart",
     [], [], ["hug", "step apart"]),
    ("two people bow to each other before one person attacks and the "
     "other person parries", ["attack"], ["parr"], ["bow"]),
    # -- scene-setting prefixes -----------------------------------------
    ("during a dance rehearsal, one person twirls while the other person "
     "claps along", ["twirl"], ["clap"], []),
    ("in a crowded market, one person grabs the other's arm and the other "
     "person pulls away", ["grab"], ["pulls away"], []),
    ("at the end of a duel, one person lowers the weapon and the other "
     "person salutes", ["lower"], ["salute"], []),
    # -- opponent / partner synonyms ------------------------------------
    ("one person feints left and strikes the opponent, who staggers",
     ["feint", "strike"], ["stagger"], []),
    ("the partner lifts the first person, who spreads both arms",
     ["spreads"], ["lift"], []),
    ("someone taps the other person on the shoulder and the other person "
     "turns around", ["tap"], ["turns around"], []),
    # -- multi-clause chains --------------------------------------------
    ("one person runs toward the other, then he slides low, while the "
     "other person hops over him", ["slide"], ["hop"], []),
    ("one person swings a bat, the other person ducks, then the other "
     "person charges forward", ["swings a bat"], ["duck", "charge"], []),
    ("one person opens a door and waves the other person through, and the "
     "other person nods and walks in", ["open", "wave"], ["nod", "walks in"],
     []),
    ("the first person teaches a move and the second person copies it "
     "slowly", ["teach"], ["cop"], []),
    ("one person spins and kicks, while the other person leans back to "
     "avoid it", ["spin", "kick"], ["lean"], []),
    # -- coordination inside ONE subject (must NOT split persons) --------
    ("one person raises a hand and waves at the other person",
     ["raises", "wave"], [], []),
    ("one person squats down and picks up the other person",
     ["squat", "pick"], [], []),
    # -- person 2 introduced first --------------------------------------
    ("the other person retreats as one person advances with a staff",
     ["advance"], ["retreat"], []),
    # -- no person-specific content: identity expected (NOT counted as
    #    fire) --------------------------------------------------------
    ("two people walk forward together", [], [], ["walk forward"]),
    ("a pair of dancers perform a routine", [], [], []),
    ("the crowd watches a performance", [], [], []),
    ("both of them jump at the same time", [], [], ["jump"]),
    # -- longer narrative captions --------------------------------------
    ("one person stands guard with arms crossed, while the other person "
     "sneaks behind him and taps his back, then one person spins around "
     "in surprise", ["stands guard", "spins around"], ["sneak", "tap"], []),
    ("one person kneels to tie a shoe, meanwhile the other person "
     "stretches both legs", ["tie"], ["stretch"], []),
    ("one person falls backwards and the other person catches him under "
     "the arms", ["falls"], ["catch"], []),
    ("one person pretends to throw, then he really throws, and the other "
     "person flinches twice", ["throw"], ["flinch"], []),
    ("the second person offers a hand and the first person pulls himself "
     "up", ["pulls"], ["offers a hand"], []),
    ("one person dribbles a ball between the legs while the other person "
     "tries to steal it", ["dribble"], ["steal"], []),
    ("one person marches in place and the other person mimics the "
     "movement exactly", ["march"], ["mimic"], []),
    ("one person draws a circle in the air, the other person shakes the "
     "head", ["draw"], ["shake"], []),
    ("one person carries a heavy box and the other person clears the "
     "path ahead", ["carr"], ["clear"], []),
    ("one person salutes, then both turn and walk away in opposite "
     "directions", ["salute"], [], ["turn", "walk away"]),
    ("one person whispers to the other person, who laughs and slaps a "
     "knee", ["whisper"], ["laugh", "slap"], []),
    ("one person balances on one leg while the other person circles "
     "around watching", ["balanc"], ["circles around"], []),
    ("one person performs a cartwheel and the other person applauds "
     "enthusiastically", ["cartwheel"], ["applaud"], []),
]


def score(decomposer) -> dict:
    fired = 0
    kw_total = kw_correct = kw_leaked = 0
    per_caption = []
    for caption, p1_kw, p2_kw, both_kw in CORPUS:
        [t1], [t2] = (lambda r: ([r[0][0]], [r[1][0]]))(decomposer([caption]))
        is_fire = (t1, t2) != (caption, caption)
        fired += is_fire
        lo1, lo2 = t1.lower(), t2.lower()
        ok = True
        for kw in p1_kw:
            kw_total += 1
            hit = kw in lo1
            leak = kw in lo2
            kw_correct += hit and not leak
            kw_leaked += leak
            ok &= hit and not leak
        for kw in p2_kw:
            kw_total += 1
            hit = kw in lo2
            leak = kw in lo1
            kw_correct += hit and not leak
            kw_leaked += leak
            ok &= hit and not leak
        for kw in both_kw:
            kw_total += 1
            hit = kw in lo1 and kw in lo2
            kw_correct += hit
            ok &= hit
        per_caption.append({"caption": caption, "fired": bool(is_fire),
                            "ok": bool(ok), "t1": t1, "t2": t2})
    n = len(CORPUS)
    return {
        "captions": n,
        "fire_rate": round(fired / n, 4),
        "keyword_total": kw_total,
        "subject_accuracy": round(kw_correct / max(1, kw_total), 4),
        "leak_rate": round(kw_leaked / max(1, kw_total), 4),
        "captions_fully_correct": sum(c["ok"] for c in per_caption),
        "per_caption": per_caption,
    }


def main() -> None:
    from mixermdm_tpu.eval.decompose import heuristic_text_decomposer
    from mixermdm_tpu.eval.datasets import default_text_decomposer

    heur = score(heuristic_text_decomposer)
    ident = score(default_text_decomposer)
    result = {
        "heuristic": {k: v for k, v in heur.items() if k != "per_caption"},
        "identity": {k: v for k, v in ident.items() if k != "per_caption"},
        "detail_heuristic": heur["per_caption"],
    }
    out = os.path.join(os.path.dirname(__file__), "..",
                       "decompose_corpus.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("heuristic", "identity")},
                     indent=2))


if __name__ == "__main__":
    main()
