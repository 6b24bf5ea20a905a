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


def _fake_clip_load(_name, device="cpu", jit=False):
    """Deterministic random-weight stand-in for ``clip.load`` — only the
    attributes the reference InterCLIP reads (evaluation/models.py:103-108):
    token_embedding, positional_embedding, dtype."""
    import torch as th
    import torch.nn as nn

    class _FakeClip(nn.Module):
        def __init__(self):
            super().__init__()
            g = th.Generator().manual_seed(1234)
            self.token_embedding = nn.Embedding(49408, 768)
            with th.no_grad():
                self.token_embedding.weight.copy_(
                    th.randn(49408, 768, generator=g) * 0.02
                )
            self.positional_embedding = nn.Parameter(
                th.randn(77, 768, generator=g) * 0.01
            )
            self.dtype = th.float32

    return _FakeClip(), None


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
        _stub("clip", load=_fake_clip_load, tokenize=_unavailable)

    if "yacs" not in sys.modules:
        # utils.configs imports yacs at module scope; parity tests never call
        # get_config, so a minimal CfgNode suffices.
        class _CfgNode(dict):
            def __init__(self, *a, new_allowed=False, **k):
                super().__init__(*a, **k)

            def merge_from_file(self, *_a, **_k):
                _unavailable()

            def freeze(self):
                pass

        yacs = _stub("yacs")
        yacs.config = _stub("yacs.config", CfgNode=_CfgNode)

    return importlib.import_module(module)
