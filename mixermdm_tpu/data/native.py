"""ctypes bindings for the native motion-feature pipeline (csrc/motion_ops.cpp).

Builds the shared library on first use (g++ -O3), caches it next to the
source, and falls back transparently to the numpy implementation in
:mod:`mixermdm_tpu.utils.features` when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SRC = os.path.abspath(os.path.join(_CSRC, "motion_ops.cpp"))
_SO = os.path.abspath(os.path.join(_CSRC, "libmotion_ops.so"))


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.process_motion_interhuman.restype = ctypes.c_int
        lib.process_motion_interhuman.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.pad_stack.restype = ctypes.c_int
        lib.process_pair_interhuman.restype = ctypes.c_int
        lib.process_pair_interhuman.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        return _LIB


def process_motion_interhuman_native(
    motion: np.ndarray, feet_thre: float, prev_frames: int, flip: bool = True
):
    """Native twin of ``utils.features.process_motion_interhuman``.

    Returns ``(feats (T-1, 262), root_quat (1, 4), root_pos (1, 3))`` or
    falls back to numpy when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        from ..utils.features import process_motion_interhuman

        return process_motion_interhuman(motion, feet_thre, prev_frames, 22, flip)

    motion = np.ascontiguousarray(motion, np.float32)
    T, stride = motion.shape
    out = np.empty((T - 1, 262), np.float32)
    quat = np.empty((4,), np.float32)
    pos = np.empty((3,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.process_motion_interhuman(
        motion.ctypes.data_as(fp), T, stride,
        ctypes.c_float(feet_thre), prev_frames, int(flip),
        out.ctypes.data_as(fp), quat.ctypes.data_as(fp), pos.ctypes.data_as(fp),
    )
    if rc != 0:
        raise ValueError(f"process_motion_interhuman failed: rc={rc}")
    return out, quat[None], pos[None]


def process_pair_interhuman_native(
    m1: np.ndarray,
    m2: np.ndarray,
    feet_thre: float,
    prev_frames: int,
    max_len: int,
    flip: bool = True,
):
    """Fused two-person item path: canonicalise both persons, apply the
    person-2-into-person-1 relative rigid transform (reference
    interhuman.py:208-216), and zero-pad to ``max_len`` — one GIL-released
    native call per training item, so thread workers scale.

    Returns ``(m1 (max_len, 262), m2 (max_len, 262), gt_len)`` or ``None``
    when the native library is unavailable (caller takes the per-stage path).
    """
    lib = get_lib()
    if lib is None:
        return None
    m1 = np.ascontiguousarray(m1, np.float32)
    m2 = np.ascontiguousarray(m2, np.float32)
    T, stride = m1.shape
    if m2.shape != (T, stride) or T - 1 > max_len:
        return None
    out1 = np.empty((max_len, 262), np.float32)
    out2 = np.empty((max_len, 262), np.float32)
    gt_len = np.empty((1,), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.process_pair_interhuman(
        m1.ctypes.data_as(fp), m2.ctypes.data_as(fp), T, stride,
        ctypes.c_float(feet_thre), prev_frames, int(flip), max_len,
        out1.ctypes.data_as(fp), out2.ctypes.data_as(fp),
        gt_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"process_pair_interhuman failed: rc={rc}")
    return out1, out2, int(gt_len[0])


def native_available() -> bool:
    return get_lib() is not None
