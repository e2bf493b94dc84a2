"""LPIPS perceptual metric, implemented natively in JAX.

LPIPS is the fourth y-axis of the reference RD curves
(`/root/reference/assets/rdcurve.png`, bottom-left panel; BASELINE.md). The
reference repo itself computes it nowhere (no eval harness exists); the
published curves follow Zhang et al. 2018 ("The Unreasonable Effectiveness
of Deep Features"): frozen backbone features, unit-normalized per channel,
squared difference, learned non-negative 1x1 "linear calibration" heads,
spatial mean, summed over layers.

This module re-implements that computation from the paper definition:

- `alexnet_features` / `vgg16_features`: the two standard backbones as pure
  functions of a params pytree (no torchvision dependency).
- `lpips(a, b, params)`: the distance, jittable, NHWC in [0, 1].
- `load_torch_lpips(path)`: converts a checkpoint saved by the public
  `lpips` pip package (torch state dict, e.g. `lpips.LPIPS(net='alex')`)
  into this module's params pytree. Pretrained weights cannot be bundled
  (no network egress in this environment); point this at a downloaded
  checkpoint to reproduce the published numbers.
- `init_lpips_params(rng)`: random init with the correct shapes — useful
  for tests and for training a calibration from scratch.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (out_c, kernel, stride, pad, followed_by_maxpool) per conv; features are
# tapped after each ReLU marked tap=True.
_ALEX_CFG: Sequence[Tuple[int, int, int, int, bool, bool]] = (
    # out, k, stride, pad, maxpool_before, tap
    (64, 11, 4, 2, False, True),
    (192, 5, 1, 2, True, True),
    (384, 3, 1, 1, True, True),
    (256, 3, 1, 1, False, True),
    (256, 3, 1, 1, False, True),
)

# VGG16 conv plan; taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_VGG_PLAN = ((64, 64), (128, 128), (256, 256, 256),
             (512, 512, 512), (512, 512, 512))

ALEX_CHANNELS = (64, 192, 384, 256, 256)
VGG_CHANNELS = (64, 128, 256, 512, 512)

# LPIPS input scaling layer constants (shift/scale applied to [-1,1] input).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def alexnet_features(params: Dict[str, Any], x) -> List[jnp.ndarray]:
    """AlexNet conv trunk; returns the 5 post-ReLU feature maps."""
    feats = []
    for i, (_, k, s, p, pool_before, tap) in enumerate(_ALEX_CFG):
        if pool_before:
            x = _maxpool(x)
        w, b = params[f"conv{i}"]["w"], params[f"conv{i}"]["b"]
        x = jax.nn.relu(_conv(x, w, b, stride=s, pad=p))
        if tap:
            feats.append(x)
    return feats


def vgg16_features(params: Dict[str, Any], x) -> List[jnp.ndarray]:
    """VGG16 conv trunk; returns the 5 standard LPIPS tap feature maps."""
    feats = []
    idx = 0
    for stage, widths in enumerate(_VGG_PLAN):
        for _ in widths:
            w, b = params[f"conv{idx}"]["w"], params[f"conv{idx}"]["b"]
            x = jax.nn.relu(_conv(x, w, b, stride=1, pad=1))
            idx += 1
        feats.append(x)
        if stage < len(_VGG_PLAN) - 1:
            x = _maxpool(x, k=2, s=2)
    return feats


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps)


def lpips(a, b, params: Dict[str, Any], net: str = "alex"):
    """LPIPS distance between NHWC sRGB images in [0, 1]. Jittable.

    `params` = {"net": backbone params, "lins": [per-layer (1,1,C,1) w]}.
    Returns the batch-mean distance (scalar).
    """
    extract = alexnet_features if net == "alex" else vgg16_features

    def prep(img):
        img = img.astype(jnp.float32) * 2.0 - 1.0  # [0,1] -> [-1,1]
        return (img - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)

    fa = extract(params["net"], prep(a))
    fb = extract(params["net"], prep(b))
    total = 0.0
    for feat_a, feat_b, lin_w in zip(fa, fb, params["lins"]):
        d = (_normalize(feat_a) - _normalize(feat_b)) ** 2
        # Non-negative 1x1 calibration conv, then spatial average.
        w = jnp.maximum(lin_w, 0.0)
        layer = jax.lax.conv_general_dilated(
            d, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(jnp.mean(layer, axis=(1, 2)))
    return total


def init_lpips_params(rng, net: str = "alex") -> Dict[str, Any]:
    """Random-init params with the correct pytree structure/shapes."""
    params: Dict[str, Any] = {"net": {}, "lins": []}
    keys = jax.random.split(rng, 32)
    ki = 0
    if net == "alex":
        in_c = 3
        for i, (out_c, k, _, _, _, _) in enumerate(_ALEX_CFG):
            params["net"][f"conv{i}"] = {
                "w": jax.random.normal(keys[ki], (k, k, in_c, out_c)) * 0.05,
                "b": jnp.zeros((out_c,)),
            }
            ki += 1
            in_c = out_c
        chans = ALEX_CHANNELS
    else:
        in_c = 3
        idx = 0
        for widths in _VGG_PLAN:
            for out_c in widths:
                params["net"][f"conv{idx}"] = {
                    "w": jax.random.normal(keys[ki % 32], (3, 3, in_c, out_c)) * 0.05,
                    "b": jnp.zeros((out_c,)),
                }
                idx += 1
                ki += 1
                in_c = out_c
        chans = VGG_CHANNELS
    for c in chans:
        params["lins"].append(
            jnp.abs(jax.random.normal(keys[ki % 32], (1, 1, c, 1))) * 0.1)
        ki += 1
    return params


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_lpips(path: str, net: str = "alex") -> Dict[str, Any]:
    """Convert a torch LPIPS checkpoint into this module's params pytree.

    Accepts either a full `lpips.LPIPS` state dict (keys `net.slice*.*`,
    `lin*.model.1.weight`) or the pip package's lin-only checkpoint
    (`lin*.model.1.weight` + separately torchvision backbone keys
    `features.N.weight`). Runs on host (needs torch, CPU build is fine).
    """
    import torch  # local import: host-side conversion only

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    params: Dict[str, Any] = {"net": {}, "lins": []}

    # Backbone weights: either `net.sliceK.IDX.weight` or `features.IDX.weight`.
    feat_keys = sorted(
        (k for k in sd if k.endswith(".weight") and
         (".slice" in k or k.startswith("features."))),
        key=lambda k: [int(t) for t in k.split(".") if t.isdigit()])
    conv_i = 0
    for k in feat_keys:
        w = sd[k]
        if w.ndim != 4:
            continue
        b = sd[k[: -len("weight")] + "bias"]
        params["net"][f"conv{conv_i}"] = {
            "w": jnp.asarray(_oihw_to_hwio(w)), "b": jnp.asarray(b)}
        conv_i += 1

    n_lins = len(ALEX_CHANNELS if net == "alex" else VGG_CHANNELS)
    for i in range(n_lins):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                params["lins"].append(jnp.asarray(_oihw_to_hwio(sd[key])))
                break
        else:
            raise KeyError(f"lin{i} calibration weight not found in {path}")
    if conv_i == 0:
        raise KeyError(
            f"no backbone conv weights in {path}; pass a full LPIPS state "
            "dict (lpips.LPIPS(net=...).state_dict()) not the lin-only file")
    return params
