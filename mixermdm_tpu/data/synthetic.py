"""Synthetic dataset fixtures in the reference's on-disk layouts.

SURVEY.md §4 test plan item (c): a tiny generated dataset + miniature
configs enable end-to-end train/sample smoke tests with no real data.
Writes the InterHuman layout (``motions_processed/person{1,2}``, ``annots``,
``annots_individual``, ``split/*.txt`` — interhuman.py:37-94) and the
HumanML3D layout (``joints_vec``, ``texts``, ``train.txt`` —
humanml3d.py:38-74).
"""

from __future__ import annotations

import os
from os.path import join as pjoin

import numpy as np

_TEXTS = [
    "two people walk towards each other and hug",
    "one person pushes the other on the left shoulder",
    "both persons dance clockwise holding hands",
]
_IND_TEXTS = ["a person walks forward", "a person raises the right arm"]


def _random_raw_motion(rng, n_frames: int) -> np.ndarray:
    """(T, 62*3 + 21*6) raw-layout motion with a plausible walking root."""
    pos = rng.standard_normal((n_frames, 62, 3)).astype(np.float32) * 0.05
    pos[..., 1] += 0.9
    walk = np.linspace(0, 1.5, n_frames, dtype=np.float32)
    pos[:, :, 2] += walk[:, None]
    rot = rng.standard_normal((n_frames, 62 * 3 - 62 * 3)).astype(np.float32)
    rot6d = np.tile(
        np.asarray([1, 0, 0, 0, 1, 0], np.float32), (n_frames, 21)
    ) + rng.standard_normal((n_frames, 21 * 6)).astype(np.float32) * 0.05
    extra = rng.standard_normal((n_frames, 0)).astype(np.float32)
    flat = np.concatenate(
        [pos.reshape(n_frames, -1), rot6d, extra], axis=1
    )
    # pad the layout out to 62*3 + 21*6 exactly
    assert flat.shape[1] == 62 * 3 + 21 * 6
    return flat


def make_interhuman_fixture(root: str, n_clips: int = 4, n_frames: int = 40, seed: int = 0,
                            test_all: bool = False):
    rng = np.random.default_rng(seed)
    os.makedirs(pjoin(root, "motions_processed", "person1"), exist_ok=True)
    os.makedirs(pjoin(root, "motions_processed", "person2"), exist_ok=True)
    os.makedirs(pjoin(root, "annots"), exist_ok=True)
    os.makedirs(pjoin(root, "annots_individual", "person1"), exist_ok=True)
    os.makedirs(pjoin(root, "annots_individual", "person2"), exist_ok=True)
    os.makedirs(pjoin(root, "split"), exist_ok=True)

    names = []
    for i in range(n_clips):
        name = f"clip{i:03d}"
        names.append(name)
        np.save(pjoin(root, "motions_processed", "person1", f"{name}.npy"),
                _random_raw_motion(rng, n_frames))
        np.save(pjoin(root, "motions_processed", "person2", f"{name}.npy"),
                _random_raw_motion(rng, n_frames))
        with open(pjoin(root, "annots", f"{name}.txt"), "w") as f:
            f.write("\n".join(_TEXTS))
        for p in ("person1", "person2"):
            with open(pjoin(root, "annots_individual", p, f"{name}.txt"), "w") as f:
                f.write("\n".join(_IND_TEXTS))

    test_sel = names if test_all else names[-2:]
    for split, sel in (("train", names), ("val", names[:1]), ("test", test_sel)):
        with open(pjoin(root, "split", f"{split}.txt"), "w") as f:
            f.write("\n".join(sel) + "\n")
    return names


def make_hml3d_fixture(root: str, n_clips: int = 4, n_frames: int = 40, seed: int = 1):
    rng = np.random.default_rng(seed)
    os.makedirs(pjoin(root, "joints_vec"), exist_ok=True)
    os.makedirs(pjoin(root, "texts"), exist_ok=True)

    names = []
    for i in range(n_clips):
        name = f"hml{i:03d}"
        names.append(name)
        motion = rng.standard_normal((n_frames, 262)).astype(np.float32) * 0.1
        np.save(pjoin(root, "joints_vec", f"{name}.npy"), motion)
        with open(pjoin(root, "texts", f"{name}.txt"), "w") as f:
            f.write("a person does something#0.0#0.0\n")
    for split in ("train", "val", "test"):
        with open(pjoin(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    return names
