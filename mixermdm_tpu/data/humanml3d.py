"""HumanML3D dataset: single-person motions in the 262-d IH layout.

Parity source ``/root/reference/src/datasets/humanml3d.py:11-149``:
``joints_vec/*.npy`` motion files, ``texts/*.txt`` captions (caption before
the first ``#``), random text, random <=300-frame crop, zero-pad;
``extended=True`` duplicates the motion/text to mimic the 7-field interaction
item (humanml3d.py:146-149).
"""

from __future__ import annotations

import os
import random
from os.path import join as pjoin
from typing import Optional

import numpy as np

MAX_GT_LENGTH = 300
MIN_GT_LENGTH = 15


class HumanML3DDataset:
    def __init__(
        self,
        data_root: str,
        mode: str = "train",
        extended: bool = False,
        cache: bool = True,
        num_samples: int = -1,
        max_gt_length: int = MAX_GT_LENGTH,
        rng: Optional[random.Random] = None,
    ):
        self.extended = extended
        self.cache = cache
        self.max_gt_length = max_gt_length
        self.min_length = MIN_GT_LENGTH
        self.rng = rng or random.Random(0)

        split_path = os.path.join(data_root, f"{mode}.txt")
        try:
            with open(split_path) as f:
                names = {l.strip() for l in f if l.strip()}
        except OSError:
            names = set()
        if num_samples > 0:
            names = set(list(names)[:num_samples])

        self.motion_store: dict = {}
        self.items: list = []
        motion_dir = pjoin(data_root, "joints_vec")
        files = sorted(os.listdir(motion_dir)) if os.path.isdir(motion_dir) else []
        index = 0
        for file in files:
            stem = file.split(".")[0]
            if names and stem not in names:
                continue
            mpath = pjoin(motion_dir, file)
            tpath = mpath.replace("joints_vec", "texts").replace("npy", "txt")
            try:
                with open(tpath) as f:
                    texts = [l.strip() for l in f if l.strip()]
                motion = np.load(mpath).astype(np.float32)
            except OSError:
                continue
            if motion.shape[0] < self.min_length:
                continue
            self.motion_store[index] = motion if cache else mpath
            self.items.append({"name": stem, "motion_id": index, "texts": texts})
            index += 1

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int) -> dict:
        item = self.items[i % len(self)]
        full = (
            self.motion_store[item["motion_id"]]
            if self.cache
            else np.load(self.motion_store[item["motion_id"]]).astype(np.float32)
        )
        text = self.rng.choice(item["texts"]).split("#")[0].strip()

        length = full.shape[0]
        if length > self.max_gt_length:
            start = self.rng.randrange(0, length - self.max_gt_length)
            motion = full[start : start + self.max_gt_length]
        else:
            motion = full[: self.max_gt_length]

        gt_length = len(motion)
        if gt_length < self.max_gt_length:
            pad = np.zeros((self.max_gt_length - gt_length, motion.shape[1]), motion.dtype)
            motion = np.concatenate([motion, pad], axis=0)

        out = {
            "name": item["name"],
            "text": text,
            "motion1": motion.astype(np.float32),
            "motion_lens": gt_length,
        }
        if self.extended:
            out["motion2"] = out["motion1"]
            out["text_individual1"] = text
            out["text_individual2"] = text
        return out
