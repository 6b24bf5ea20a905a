"""Golden-activation fixture store for the reference-parity harness.

VERDICT r2 item 4: the parity tests import the LIVE torch reference, so
parity coverage silently depended on torch being importable.  Fixtures pin
the reference activations (and the CONVERTED our-side params + inputs) into
small committed ``.npz`` files:

* ``test_reference_parity.py`` calls :func:`save_or_check` after computing a
  reference output — first live run records the fixture, later live runs
  assert the reference still produces the recorded values (catches fixture
  staleness and reference/converter drift).
* ``test_golden.py`` (torch-free) replays OUR implementation against the
  recorded activations, so ``pytest tests/`` stays green and parity-covered
  with torch absent.

Nested dicts of arrays are flattened with ``/``-joined keys.
"""

from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden")


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            assert "/" not in str(k), k
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def path_for(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.npz")


def exists(name: str) -> bool:
    return os.path.exists(path_for(name))


def save(name: str, tree: dict) -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    flat = _flatten(tree)
    np.savez_compressed(path_for(name), **flat)


def load(name: str) -> dict:
    with np.load(path_for(name), allow_pickle=False) as z:
        return _unflatten({k: z[k] for k in z.files})


def save_or_check(name: str, tree: dict, atol: float = 1e-5, rtol: float = 1e-5):
    """Record the fixture on first live run; on later runs assert the live
    values still match the stored ones (fixture-diff regression gate)."""
    if not exists(name):
        save(name, tree)
        print(f"[golden] recorded {name}")
        return
    stored = _flatten(load(name))
    live = _flatten(tree)
    assert set(stored) == set(live), (
        f"golden fixture {name} key mismatch: "
        f"{set(stored) ^ set(live)}"
    )
    for k in stored:
        if stored[k].dtype.kind in "US":  # strings: exact
            np.testing.assert_array_equal(stored[k], live[k], err_msg=f"{name}:{k}")
        else:
            np.testing.assert_allclose(
                live[k], stored[k], atol=atol, rtol=rtol,
                err_msg=f"golden fixture {name} drifted at {k} — the live "
                        "reference (or a converter) no longer reproduces the "
                        "recorded activations",
            )
