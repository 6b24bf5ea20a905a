"""InterHuman dataset: two-person motions + interaction/individual texts.

Parity source ``/root/reference/src/datasets/interhuman.py`` and
``src/utils/preprocess.py:6-34``.  Behaviours reproduced: split files under
``split/{train,val,test}.txt``, per-clip text files with the left/right +
cw/ccw swap augmentation (:75-94), raw 62-joint motion files reduced to
22 joints + 21x6d rotations, mirrored copies for train, random text choice,
random <=300-frame crop, random person swap, per-clip canonicalisation with
the relative rigid transform of person 2 into person 1's frame (:208-216),
zero-padding to 300 frames.

TPU-first differences: items are dicts (not tuples), batching pads to a
*static* ``max_frames`` so every train step compiles once, and the collate
path is pure numpy feeding ``jax.device_put`` (no torch DataLoader).
"""

from __future__ import annotations

import os
import random
from os.path import join as pjoin
from typing import Optional

import numpy as np

from ..utils.features import rigid_transform, swap_left_right

MAX_GT_LENGTH = 300
MIN_GT_LENGTH = 15


def _swap_text(s: str) -> str:
    """left<->right, clockwise<->counterclockwise (interhuman.py:76-78)."""
    s = s.replace("left", "\0").replace("right", "left").replace("\0", "right")
    return s.replace("clockwise", "\0").replace("counterclockwise", "clockwise").replace(
        "\0", "counterclockwise"
    )


def load_raw_motion(path: str, min_length: int, swap: bool = False):
    """Raw 62-joint file -> (T, 22*3 + 21*6) [+ mirrored copy]
    (preprocess.py:6-34)."""
    try:
        raw = np.load(path).astype(np.float32)
    except Exception:
        return None, None
    pos = raw[:, : 22 * 3]
    rot = raw[:, 62 * 3 : 62 * 3 + 21 * 6]
    motion = np.concatenate([pos, rot], axis=1)
    if motion.shape[0] < min_length:
        return None, None
    mirrored = swap_left_right(motion, 22) if swap else None
    return motion, mirrored


class InterHumanDataset:
    """Random-access dataset over the InterHuman directory layout."""

    def __init__(
        self,
        data_root: str,
        mode: str = "train",
        extended: bool = True,
        cache: bool = True,
        num_samples: int = -1,
        max_gt_length: int = MAX_GT_LENGTH,
        rng: Optional[random.Random] = None,
    ):
        self.mode = mode
        self.extended = extended
        self.cache = cache
        self.max_gt_length = max_gt_length
        self.min_length = MIN_GT_LENGTH
        self.rng = rng or random.Random(0)

        split_path = os.path.join(data_root, "split", f"{mode}.txt")
        try:
            with open(split_path) as f:
                names = {l.strip() for l in f if l.strip()}
        except OSError:
            names = set()

        self.motion_store: dict = {}
        self.items: list = []

        root = pjoin(data_root, "motions_processed", "person1")
        files = sorted(os.listdir(root)) if os.path.isdir(root) else []
        if num_samples > 0:
            names = set(list(names)[:num_samples])

        index = 0
        for file in files:
            stem = file.split(".")[0]
            if names and stem not in names:
                continue
            p1 = pjoin(root, file)
            p2 = p1.replace("person1", "person2")
            text_path = (
                p1.replace("motions_processed", "annots").replace("person1", "")
                .replace("npy", "txt")
            )
            try:
                with open(text_path) as f:
                    texts = [l.strip() for l in f if l.strip()]
            except OSError:
                continue
            texts_swap = [_swap_text(t) for t in texts]

            ind1 = ind2 = ind1_swap = ind2_swap = None
            if extended:
                t1_path = p1.replace("motions_processed", "annots_individual").replace("npy", "txt")
                t2_path = p2.replace("motions_processed", "annots_individual").replace("npy", "txt")
                if not os.path.exists(t1_path):
                    continue
                with open(t1_path) as f:
                    ind1 = [l.strip() for l in f if l.strip()]
                with open(t2_path) as f:
                    ind2 = [l.strip() for l in f if l.strip()]
                ind1_swap = [_swap_text(t) for t in ind1]
                ind2_swap = [_swap_text(t) for t in ind2]

            want_swap = mode == "train"
            m1, m1s = load_raw_motion(p1, self.min_length, swap=want_swap)
            m2, m2s = load_raw_motion(p2, self.min_length, swap=want_swap)
            if m1 is None or m2 is None:
                continue
            self.motion_store[index] = (m1, m2) if cache else (p1, p2, False)
            self.motion_store[index + 1] = (m1s, m2s) if cache else (p1, p2, True)

            item = {"name": stem, "motion_id": index, "texts": texts}
            if extended:
                item.update(texts_individual1=ind1, texts_individual2=ind2)
            self.items.append(item)
            if mode == "train":
                sw = {"name": stem + "_swap", "motion_id": index + 1, "texts": texts_swap}
                if extended:
                    sw.update(texts_individual1=ind1_swap, texts_individual2=ind2_swap)
                self.items.append(sw)
            index += 2

    def __len__(self):
        return len(self.items)

    def _motions(self, motion_id):
        entry = self.motion_store[motion_id]
        if self.cache:
            return entry
        p1, p2, swap = entry
        m1, m1s = load_raw_motion(p1, self.min_length, swap=swap)
        m2, m2s = load_raw_motion(p2, self.min_length, swap=swap)
        return (m1s, m2s) if swap else (m1, m2)

    def __getitem__(self, i: int) -> dict:
        item = self.items[i % len(self)]
        full1, full2 = self._motions(item["motion_id"])

        text = self.rng.choice(item["texts"])
        t1 = self.rng.choice(item.get("texts_individual1", [text]))
        t2 = self.rng.choice(item.get("texts_individual2", [text]))

        # Random crop (interhuman.py:190-200): note the +1-frame slack — the
        # feature pipeline consumes one frame for velocities.
        length = full1.shape[0]
        max_len = self.max_gt_length + 1 - 1  # reference max_length
        if length > max_len:
            start = self.rng.randrange(0, length - self.max_gt_length)
            m1 = full1[start : start + self.max_gt_length]
            m2 = full2[start : start + self.max_gt_length]
        else:
            take = min(length, self.max_gt_length)
            m1, m2 = full1[:take], full2[:take]

        # Random person swap (interhuman.py:203-205).
        if self.rng.random() > 0.5:
            m1, m2 = m2, m1
            t1, t2 = t2, t1

        # Canonicalise through the native C++ pipeline when available
        # (csrc/motion_ops.cpp; numpy fallback inside).  The fused pair call
        # does canonicalisation + relative transform + padding in one
        # GIL-released native call — the per-item hot path that lets thread
        # workers actually scale (loader_bench.json).
        from .native import (
            process_motion_interhuman_native,
            process_pair_interhuman_native,
        )

        pair = process_pair_interhuman_native(m1, m2, 0.001, 0, self.max_gt_length)
        if pair is not None:
            m1, m2, gt_length = pair
            out = {
                "name": item["name"],
                "text": text,
                "motion1": m1,
                "motion2": m2,
                "motion_lens": gt_length,
            }
            if self.extended:
                out["text_individual1"] = t1
                out["text_individual2"] = t2
            return out

        m1, quat1, pos1 = process_motion_interhuman_native(m1, 0.001, 0)
        m2, quat2, pos2 = process_motion_interhuman_native(m2, 0.001, 0)

        # Express person 2 in person 1's canonical frame (interhuman.py:208-216).
        from ..utils.features import _qrot_np

        def qmul_np(q, r):
            w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
            w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
            return np.stack(
                [
                    w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                    w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                    w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                    w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                ],
                axis=-1,
            )

        qinv1 = quat1 * np.array([1.0, -1.0, -1.0, -1.0])
        r_rel = qmul_np(quat2, qinv1)
        angle = np.arctan2(r_rel[:, 2:3], r_rel[:, 0:1])
        xz = _qrot_np(quat1, pos2 - pos1)[:, [0, 2]]
        relative = np.concatenate([angle, xz], axis=-1)[0]
        m2 = rigid_transform(relative, m2)

        gt_length = len(m1)
        if gt_length < self.max_gt_length:
            pad = np.zeros((self.max_gt_length - gt_length, m1.shape[1]), m1.dtype)
            m1 = np.concatenate([m1, pad], axis=0)
            m2 = np.concatenate([m2, pad], axis=0)

        out = {
            "name": item["name"],
            "text": text,
            "motion1": m1.astype(np.float32),
            "motion2": m2.astype(np.float32),
            "motion_lens": gt_length,
        }
        if self.extended:
            out["text_individual1"] = t1
            out["text_individual2"] = t2
        return out
