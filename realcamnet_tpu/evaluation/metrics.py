"""Image quality metrics for RD evaluation: PSNR, SSIM/MS-SSIM, Lab ΔE.

These are the reference paper's RD-curve y-axes (`assets/rdcurve.png`,
BASELINE.md): PSNR (dB), MS-SSIM (reported as -10log10(1-msssim) dB), LPIPS
(external net — see lpips.py), ΔE. All functions take NHWC float arrays in
[0, 1] and run under jit.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, max_val: float = 1.0):
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _fspecial_gauss(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def _gaussian_filter(x, win: jnp.ndarray):
    """Depthwise 'valid' 2D gaussian filter on NHWC."""
    c = x.shape[-1]
    k = win.shape[0]
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(a, b, max_val: float = 1.0, win_size: int = 11, sigma: float = 1.5,
         return_cs: bool = False):
    """SSIM (Wang et al.), gaussian-windowed, per-batch mean."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    win = jnp.asarray(_fspecial_gauss(win_size, sigma), jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _gaussian_filter(a, win)
    mu_b = _gaussian_filter(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _gaussian_filter(a * a, win) - mu_aa
    s_bb = _gaussian_filter(b * b, win) - mu_bb
    s_ab = _gaussian_filter(a * b, win) - mu_ab
    cs = (2 * s_ab + c2) / (s_aa + s_bb + c2)
    ssim_map = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    if return_cs:
        return jnp.mean(ssim_map), jnp.mean(cs)
    return jnp.mean(ssim_map)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(a, b, max_val: float = 1.0,
            weights: Sequence[float] = _MSSSIM_WEIGHTS,
            win_size: int = 11):
    """Multi-scale SSIM (5 scales, avg-pool /2 between scales).

    Scales whose downsampled size drops below the gaussian window are
    dropped (weights renormalized) so small images don't produce NaN.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    min_dim = min(a.shape[1], a.shape[2])
    usable = 1
    while usable < len(weights) and (min_dim >> usable) >= win_size:
        usable += 1
    if usable < len(weights):
        w = np.asarray(weights[:usable], np.float64)
        weights = tuple(w / w.sum())
    levels = len(weights)
    vals = []
    for i in range(levels):
        s, cs = ssim(a, b, max_val, return_cs=True)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            a = jax.lax.reduce_window(a, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4.0
            b = jax.lax.reduce_window(b, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4.0
    vals = jnp.stack(vals)
    w = jnp.asarray(weights)
    return jnp.prod(jnp.maximum(vals, 1e-6) ** w)


def ms_ssim_db(a, b, max_val: float = 1.0):
    """-10 log10(1 - MS-SSIM), the dB form plotted in the reference RD curves."""
    return -10.0 * jnp.log10(jnp.maximum(1.0 - ms_ssim(a, b, max_val), 1e-10))


# ---- CIELAB / Delta-E ----

def srgb_to_lab(rgb):
    """sRGB [0,1] -> CIELAB (D65)."""
    rgb = rgb.astype(jnp.float32)
    lin = jnp.where(rgb <= 0.04045, rgb / 12.92,
                    ((rgb + 0.055) / 1.055) ** 2.4)
    m = jnp.asarray([[0.4124564, 0.3575761, 0.1804375],
                     [0.2126729, 0.7151522, 0.0721750],
                     [0.0193339, 0.1191920, 0.9503041]], jnp.float32)
    xyz = jnp.einsum("...c,dc->...d", lin, m)
    white = jnp.asarray([0.95047, 1.0, 1.08883], jnp.float32)
    t = xyz / white
    d = 6.0 / 29.0
    f = jnp.where(t > d ** 3, jnp.cbrt(jnp.maximum(t, 1e-12)),
                  t / (3 * d * d) + 4.0 / 29.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def delta_e_cie76(rgb_a, rgb_b):
    """Mean CIE76 ΔE between two sRGB images."""
    la, lb = srgb_to_lab(rgb_a), srgb_to_lab(rgb_b)
    return jnp.mean(jnp.sqrt(jnp.sum((la - lb) ** 2, axis=-1) + 1e-12))


def delta_e_ciede2000(rgb_a, rgb_b):
    """Mean CIEDE2000 ΔE between two sRGB images."""
    lab1, lab2 = srgb_to_lab(rgb_a), srgb_to_lab(rgb_b)
    L1, a1, b1 = lab1[..., 0], lab1[..., 1], lab1[..., 2]
    L2, a2, b2 = lab2[..., 0], lab2[..., 1], lab2[..., 2]
    C1 = jnp.sqrt(a1 ** 2 + b1 ** 2 + 1e-12)
    C2 = jnp.sqrt(a2 ** 2 + b2 ** 2 + 1e-12)
    Cm = (C1 + C2) / 2
    G = 0.5 * (1 - jnp.sqrt(Cm ** 7 / (Cm ** 7 + 25.0 ** 7)))
    a1p = (1 + G) * a1
    a2p = (1 + G) * a2
    C1p = jnp.sqrt(a1p ** 2 + b1 ** 2 + 1e-12)
    C2p = jnp.sqrt(a2p ** 2 + b2 ** 2 + 1e-12)
    h1p = jnp.rad2deg(jnp.arctan2(b1, a1p)) % 360.0
    h2p = jnp.rad2deg(jnp.arctan2(b2, a2p)) % 360.0
    dLp = L2 - L1
    dCp = C2p - C1p
    dh = h2p - h1p
    dh = jnp.where(dh > 180, dh - 360, jnp.where(dh < -180, dh + 360, dh))
    dHp = 2 * jnp.sqrt(C1p * C2p + 1e-12) * jnp.sin(jnp.deg2rad(dh) / 2)
    Lmp = (L1 + L2) / 2
    Cmp = (C1p + C2p) / 2
    hsum = h1p + h2p
    hdiff = jnp.abs(h1p - h2p)
    hmp = jnp.where(hdiff > 180,
                    jnp.where(hsum < 360, (hsum + 360) / 2, (hsum - 360) / 2),
                    hsum / 2)
    T = (1 - 0.17 * jnp.cos(jnp.deg2rad(hmp - 30))
         + 0.24 * jnp.cos(jnp.deg2rad(2 * hmp))
         + 0.32 * jnp.cos(jnp.deg2rad(3 * hmp + 6))
         - 0.20 * jnp.cos(jnp.deg2rad(4 * hmp - 63)))
    d_theta = 30 * jnp.exp(-(((hmp - 275) / 25) ** 2))
    Rc = 2 * jnp.sqrt(Cmp ** 7 / (Cmp ** 7 + 25.0 ** 7))
    Sl = 1 + 0.015 * (Lmp - 50) ** 2 / jnp.sqrt(20 + (Lmp - 50) ** 2)
    Sc = 1 + 0.045 * Cmp
    Sh = 1 + 0.015 * Cmp * T
    Rt = -jnp.sin(jnp.deg2rad(2 * d_theta)) * Rc
    de = jnp.sqrt((dLp / Sl) ** 2 + (dCp / Sc) ** 2 + (dHp / Sh) ** 2
                  + Rt * (dCp / Sc) * (dHp / Sh) + 1e-12)
    return jnp.mean(de)


def bpp_from_likelihoods(likelihoods, num_pixels: int):
    total = 0.0
    for lik in jax.tree.leaves(likelihoods):
        total = total - jnp.sum(jnp.log2(lik))
    return total / num_pixels
