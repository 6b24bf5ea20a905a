"""Affine motion normalizers (mu/sigma), as immutable array pairs.

The reference ships four class variants that all do ``(x - mean) / std``
(parity source ``/root/reference/src/utils/utils.py:13-82``) with stats loaded
from ``data/global_mean.npy`` (InterHuman) / ``data/HumanML3D/mean_ih_new.npy``
(HumanML3D).  Here a normalizer is a NamedTuple of two (262,) arrays so it can
ride through jit/scan as a pytree leaf pair; loading from the reference's .npy
files is supported when a data dir is available, with identity stats as the
fallback for tests and synthetic runs.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .constants import FEATS_DIM


class Normalizer(NamedTuple):
    mean: jnp.ndarray  # (262,)
    std: jnp.ndarray   # (262,)

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Raw motion -> normalized model space."""
        return (x - self.mean) / self.std

    def backward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Normalized model space -> raw motion."""
        return x * self.std + self.mean


def identity_normalizer(dim: int = FEATS_DIM, dtype=jnp.float32) -> Normalizer:
    return Normalizer(jnp.zeros((dim,), dtype), jnp.ones((dim,), dtype))


def load_normalizer(mean_path: str, std_path: str, dtype=jnp.float32) -> Normalizer:
    mean = np.load(mean_path).astype(np.float32).reshape(-1)
    std = np.load(std_path).astype(np.float32).reshape(-1)
    return Normalizer(jnp.asarray(mean, dtype), jnp.asarray(std, dtype))


def interhuman_normalizer(data_root: str = "./data", dtype=jnp.float32) -> Normalizer:
    """Stats used by ``MotionNormalizerTorch`` (utils.py:44-61)."""
    mean_p = os.path.join(data_root, "global_mean.npy")
    std_p = os.path.join(data_root, "global_std.npy")
    if os.path.exists(mean_p) and os.path.exists(std_p):
        return load_normalizer(mean_p, std_p, dtype)
    return identity_normalizer(dtype=dtype)


def hml3d_normalizer(data_root: str = "./data", dtype=jnp.float32) -> Normalizer:
    """Stats used by ``MotionNormalizerTorchHML3D`` (utils.py:64-82)."""
    mean_p = os.path.join(data_root, "HumanML3D", "mean_ih_new.npy")
    std_p = os.path.join(data_root, "HumanML3D", "std_ih_new.npy")
    if os.path.exists(mean_p) and os.path.exists(std_p):
        return load_normalizer(mean_p, std_p, dtype)
    return identity_normalizer(dtype=dtype)
