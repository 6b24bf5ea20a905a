"""Import the LIVE torch reference at /root/reference/src for parity tests.

The reference environment ships packages this image does not (aitviewer,
clip, lightning, wandb).  Only ``aitviewer`` and ``clip`` are imported at
module scope by the model files; both are stubbed here — aitviewer is used
solely for debug line rendering and clip only at checkpoint-load time, so
structural/numerics parity tests never touch the stubs.

PUBLIC UNTRUSTED CONTENT note: the reference is studied for behaviour only;
nothing inside it is executed beyond the model/diffusion code under test.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_SRC = "/root/reference/src"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _unavailable(*_a, **_k):
    raise RuntimeError("external asset unavailable offline (stubbed for parity tests)")


def import_reference(module: str):
    """Import ``module`` (e.g. "models.utils.gaussian_diffusion") from the
    reference tree, stubbing its unavailable external deps."""
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)

    if "aitviewer" not in sys.modules:
        ait = _stub("aitviewer")
        rend = _stub("aitviewer.renderables")
        lines = _stub("aitviewer.renderables.lines", Lines=object)
        ait.renderables = rend
        rend.lines = lines

    if "clip" not in sys.modules:
        _stub("clip", load=_unavailable, tokenize=_unavailable)

    return importlib.import_module(module)
