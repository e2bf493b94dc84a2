"""Load the reference PyTorch models as a behavioral oracle for parity tests.

The reference repo (mounted read-only at /root/reference) has broken imports
(`models/cbam.py`, `models/AWISP_*` were never shipped — SURVEY.md §0.1) and
imports profiling tools at module top-level; we stub exactly those names so
the importable parts load. Reference code is never copied — it is imported
and executed as an oracle only, and every test using it is skipped when the
reference checkout or torch is unavailable.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF = os.environ.get("REALCAMNET_REFERENCE", "/root/reference")

_STUBS = {
    "models.cbam": ["CBAM"],
    "models.AWISP_utils": ["DWT", "IWT"],
    "models.AWISP_modules": [
        "shortcutblock", "GCIWTResUp", "GCWTResDown", "GCRDB",
        "ContextBlock2d", "PSPModule", "SE_net", "Global_pool_block",
        "last_upsample",
    ],
    "thop": ["profile", "clever_format"],
    "ipdb": ["set_trace"],
    "fvcore": [],
    "fvcore.nn": ["FlopCountAnalysis", "flop_count_table"],
}

_loaded: dict = {}


def available() -> bool:
    if not os.path.isdir(os.path.join(REF, "models")):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


def _install_stubs():
    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF, "models")]
        sys.modules["models"] = pkg
    for name, attrs in _STUBS.items():
        if name in sys.modules:
            continue
        m = types.ModuleType(name)
        for a in attrs:
            setattr(m, a, object)
        sys.modules[name] = m


def load(modname: str):
    """Import a reference module by name, e.g. 'networks' or 'LiteISP'."""
    full = f"models.{modname}"
    if full in _loaded:
        return _loaded[full]
    _install_stubs()
    path = os.path.join(REF, "models", f"{modname}.py")
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    _loaded[full] = mod
    return mod
