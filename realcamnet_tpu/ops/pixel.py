"""Pixel shuffle / padding / Bayer packing utilities (NHWC).

PixelShuffle channel order matches torch nn.PixelShuffle (channel c =
c_out*r^2 + i*r + j) so converted reference checkpoints stay valid.
Pad helpers mirror `LiteISP.py:84-128` (pad to multiple of 16; ISP output is
2x input so the crop is 2x the original size).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B,H,W,C*r^2) -> (B,H*r,W*r,C), torch channel semantics."""
    b, h, w, crr = x.shape
    assert crr % (r * r) == 0
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B,H,r,W,r,C)
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B,H*r,W*r,C) -> (B,H,W,C*r^2), inverse of pixel_shuffle."""
    b, hr, wr, c = x.shape
    assert hr % r == 0 and wr % r == 0
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B,H,W,C,r,r)
    return x.reshape(b, h, w, c * r * r)


def pack_bayer(raw: jnp.ndarray) -> jnp.ndarray:
    """Pack a (B,H,W,1) Bayer mosaic into (B,H/2,W/2,4) RGGB planes."""
    if raw.ndim == 3:
        raw = raw[..., None]
    return pixel_unshuffle(raw, 2)


def pad_to_multiple(x: jnp.ndarray, multiple: int = 16) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Zero-pad bottom/right so H,W are multiples of `multiple` (NHWC).

    Returns (padded, (orig_h, orig_w)). Reference `LiteISP.py:84-105`.
    """
    b, h, w, c = x.shape
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (h, w)


def remove_padding_2x(y: jnp.ndarray, orig_hw: Tuple[int, int]) -> jnp.ndarray:
    """Crop ISP output (2x upsampled) back to 2x the original size.

    Reference `LiteISP.py:107-128`.
    """
    h, w = orig_hw
    return y[:, : 2 * h, : 2 * w, :]


def pixel_shuffle_bhcw(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B,H,C*r^2,W) -> (B,H*r,C,W*r) in the channel-sublane BHCW layout,
    torch channel semantics (matches `pixel_shuffle`)."""
    b, h, crr, w = x.shape
    assert crr % (r * r) == 0
    c = crr // (r * r)
    x = x.reshape(b, h, c, r, r, w)
    x = x.transpose(0, 1, 3, 2, 5, 4)  # (B,H,r,C,W,r)
    return x.reshape(b, h * r, c, w * r)
