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


def _timm_stubs():
    """Functional timm pieces (DropPath/trunc_normal_/to_2tuple) so the
    reference groupmix.py runs as an eval-mode oracle."""
    import collections.abc
    import itertools

    import torch
    from torch import nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
            return x * mask / keep

    def to_2tuple(v):
        if isinstance(v, collections.abc.Iterable) and not isinstance(v, str):
            return tuple(itertools.islice(itertools.chain(v, itertools.repeat(v)), 2))
        return (v, v)

    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm = types.ModuleType("timm")
    models_mod = types.ModuleType("timm.models")
    models_mod.layers = layers
    timm.data = data
    timm.models = models_mod
    return {"timm": timm, "timm.data": data, "timm.models": models_mod,
            "timm.models.layers": layers}


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
    try:
        import timm  # noqa: F401
    except ImportError:
        for name, mod in _timm_stubs().items():
            sys.modules.setdefault(name, mod)
    try:
        import compressai  # noqa: F401
    except ImportError:
        for name, mod in _compressai_stubs().items():
            sys.modules.setdefault(name, mod)
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules.setdefault("torchvision", tv)
        sys.modules.setdefault("torchvision.transforms", tv.transforms)
        sys.modules.setdefault("torchvision.models", tv.models)


def _compressai_stubs():
    """Functional CompressAI stand-ins (tests/compressai_stub.py) so the
    reference tcm.py / raw2bit.py run as transform-path oracles."""
    from tests import compressai_stub as cs

    root = types.ModuleType("compressai")
    em = types.ModuleType("compressai.entropy_models")
    em.EntropyBottleneck = cs.EntropyBottleneck
    em.GaussianConditional = cs.GaussianConditional
    ans = types.ModuleType("compressai.ans")
    ans.BufferedRansEncoder = object
    ans.RansDecoder = object
    models_m = types.ModuleType("compressai.models")
    models_m.CompressionModel = cs.CompressionModel
    google = types.ModuleType("compressai.models.google")
    for n in ("FactorizedPrior", "ScaleHyperprior", "MeanScaleHyperprior",
              "JointAutoregressiveHierarchicalPriors"):
        setattr(google, n, object)
    utils = types.ModuleType("compressai.models.utils")
    utils.conv = cs.conv
    utils.deconv = cs.deconv
    utils.update_registered_buffers = cs.update_registered_buffers
    layers = types.ModuleType("compressai.layers")
    for n in ("AttentionBlock", "ResidualBlock", "ResidualBlockUpsample",
              "ResidualBlockWithStride", "conv3x3", "subpel_conv3x3", "GDN",
              "MaskedConv2d", "conv1x1"):
        setattr(layers, n, getattr(cs, n))
    datasets = types.ModuleType("compressai.datasets")
    datasets.ImageFolder = object
    datasets.Vimeo90kDataset = object
    zoo = types.ModuleType("compressai.zoo")
    zoo.models = {}
    zoo.load_state_dict = object
    models_m.google = google
    models_m.utils = utils
    root.entropy_models = em
    root.ans = ans
    root.models = models_m
    root.layers = layers
    root.datasets = datasets
    root.zoo = zoo
    return {
        "compressai": root,
        "compressai.entropy_models": em,
        "compressai.ans": ans,
        "compressai.models": models_m,
        "compressai.models.google": google,
        "compressai.models.utils": utils,
        "compressai.layers": layers,
        "compressai.datasets": datasets,
        "compressai.zoo": zoo,
    }


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
