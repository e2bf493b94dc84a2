"""Data pipeline: paired RAW/sRGB datasets, Bayer packing, coordinate maps.

The reference ships no dataloader (SURVEY.md §0); its models consume
`[raw_packed_4ch, cond_4ch, coord_2ch]` with an sRGB target at 2x packed
resolution. This module supplies:

- `coord_map`: the normalized crop-coordinate map the CADR branch consumes
  (the role the reference's `PreCoord` + dataset pipeline fills,
  `LiteISP.py:130-162`): each pixel's position within the *full* sensor frame
  scaled to [-1, 1].
- `PairedRawDataset`: .npz pairs on disk {raw (H,W) or (H,W,1) Bayer, rgb
  (2H', 2W', 3), optional crop origin + full size}, random patch cropping,
  packing, epoch iteration. Pure numpy on host; device transfer is the
  trainer's job (`prefetch_to_device`).
- `synthetic_batch`: random-but-consistent synthetic pairs for tests/bench
  (a gamma-curve "ISP" of random Bayer noise so training has signal).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def coord_map(h: int, w: int, crop_yx: Tuple[int, int] = (0, 0),
              full_hw: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """(h, w, 2) map of each pixel's normalized position in the full frame.

    full_hw defaults to (h, w) (patch == full frame). Values in [-1, 1].
    """
    fh, fw = full_hw if full_hw is not None else (h, w)
    y0, x0 = crop_yx
    ys = (np.arange(h) + y0) / max(fh - 1, 1) * 2.0 - 1.0
    xs = (np.arange(w) + x0) / max(fw - 1, 1) * 2.0 - 1.0
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([yy, xx], axis=-1).astype(np.float32)


def pack_bayer_np(raw: np.ndarray) -> np.ndarray:
    """(H, W) or (H, W, 1) Bayer mosaic -> (H/2, W/2, 4) RGGB planes."""
    if raw.ndim == 3:
        raw = raw[..., 0]
    h, w = raw.shape
    return np.stack([raw[0::2, 0::2], raw[0::2, 1::2],
                     raw[1::2, 0::2], raw[1::2, 1::2]], axis=-1)


def synthetic_batch(seed: int, batch: int, packed_size: int = 128,
                    full_hw: Optional[Tuple[int, int]] = None) -> Dict[str, np.ndarray]:
    """Deterministic synthetic batch: smooth random Bayer + gamma sRGB target.

    The target is a fixed differentiable function of the raw (demosaic-mean +
    gamma + vignetting consistent with coord), so models can actually fit it
    in smoke training runs.
    """
    rng = np.random.RandomState(seed)
    s = packed_size
    full = full_hw or (s, s)
    out_raw = np.zeros((batch, s, s, 4), np.float32)
    out_cond = np.zeros((batch, s, s, 4), np.float32)
    out_coord = np.zeros((batch, s, s, 2), np.float32)
    out_rgb = np.zeros((batch, 2 * s, 2 * s, 3), np.float32)
    for b in range(batch):
        base = rng.rand(s // 4 + 1, s // 4 + 1, 3).astype(np.float32)
        up = np.kron(base, np.ones((4, 4, 1), np.float32))[: s, : s]
        r, g, bch = up[..., 0], up[..., 1], up[..., 2]
        packed = np.stack([r, g, g * 0.98 + 0.02 * bch, bch], -1)
        coord = coord_map(s, s, (0, 0), full)
        vign = 1.0 - 0.3 * (coord[..., 0] ** 2 + coord[..., 1] ** 2) / 2.0
        packed_v = packed * vign[..., None]
        rgb_small = np.stack([packed[..., 0],
                              0.5 * (packed[..., 1] + packed[..., 2]),
                              packed[..., 3]], -1) ** (1 / 2.2)
        rgb = np.kron(rgb_small, np.ones((2, 2, 1), np.float32))[: 2 * s, : 2 * s]
        out_raw[b] = packed_v
        out_cond[b] = packed_v
        out_coord[b] = coord
        out_rgb[b] = np.clip(rgb, 0, 1)
    return {"raw": out_raw, "cond": out_cond, "coord": out_coord,
            "target": out_rgb}


def synthetic_batch_jax(key, batch: int, packed_size: int = 128,
                        full_hw: Optional[Tuple[int, int]] = None) -> Dict[str, jnp.ndarray]:
    """Device-side synthetic pairs: jit-friendly twin of `synthetic_batch`.

    Built for the on-device scan trainer (train/rd.py): generating batches
    inside the jitted step removes the per-step host->device transfer that
    dominates wall time on remote-dispatch backends.

    Content is a multi-scale random field (smooth base + mid detail + blocky
    edges) squashed to (0,1) — spatially correlated, hence *compressible*, so
    RD training has a meaningful operating range (unlike iid noise). The
    raw->target mapping matches `synthetic_batch`'s physics: RGGB packing with
    correlated greens, coordinate-dependent vignetting on the raw only (the
    CADR branch must undo it via `coord`), green averaging + 1/2.2 gamma and
    2x upsample for the sRGB target.
    """
    s = packed_size
    assert s % 16 == 0, "packed_size must be a multiple of 16"
    fh, fw = full_hw if full_hw is not None else (s, s)
    k1, k2, k3 = jax.random.split(key, 3)
    shape = lambda d: (batch, s // d, s // d, 3)
    up = lambda x: jax.image.resize(x, (batch, s, s, 3), "bilinear")
    lo = jax.random.normal(k1, shape(16), jnp.float32)
    mid = jax.random.normal(k2, shape(4), jnp.float32)
    blocks = jax.random.normal(k3, shape(8), jnp.float32)
    field = (1.2 * up(lo) + 0.35 * up(mid)
             + 0.3 * jax.image.resize(blocks, (batch, s, s, 3), "nearest"))
    rgb_lin = jax.nn.sigmoid(1.5 * field)
    r, g, b = rgb_lin[..., 0], rgb_lin[..., 1], rgb_lin[..., 2]
    g2 = 0.98 * g + 0.02 * b
    packed = jnp.stack([r, g, g2, b], axis=-1)
    ys = jnp.arange(s) / max(fh - 1, 1) * 2.0 - 1.0
    xs = jnp.arange(s) / max(fw - 1, 1) * 2.0 - 1.0
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    coord = jnp.broadcast_to(jnp.stack([yy, xx], -1)[None],
                             (batch, s, s, 2)).astype(jnp.float32)
    vign = 1.0 - 0.3 * (yy ** 2 + xx ** 2) / 2.0
    raw = packed * vign[None, :, :, None]
    rgb_small = jnp.stack([r, 0.5 * (g + g2), b], -1) ** (1.0 / 2.2)
    rgb = jax.image.resize(rgb_small, (batch, 2 * s, 2 * s, 3), "nearest")
    return {"raw": raw, "cond": raw, "coord": coord,
            "target": jnp.clip(rgb, 0.0, 1.0)}


def synthetic_eval_batches_jax(seed: int, num: int, packed_size: int = 128,
                               batch: int = 1) -> Iterator[Dict[str, jnp.ndarray]]:
    """Deterministic eval batches drawn from `synthetic_batch_jax`'s
    distribution (fold_in-keyed), matching what the scan trainer saw."""
    for i in range(num):
        key = jax.random.fold_in(jax.random.key(seed), i)
        yield synthetic_batch_jax(key, batch, packed_size)


def _inv3(m):
    """Batched closed-form 3x3 inverse (adjugate / det) — jit-friendly,
    no LAPACK. m: (..., 3, 3)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A, B, C = e * i - f * h, c * h - b * i, b * f - c * e
    D, E, F = f * g - d * i, a * i - c * g, c * d - a * f
    G, H, I = d * h - e * g, b * g - a * h, a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.stack([jnp.stack([A, B, C], -1), jnp.stack([D, E, F], -1),
                     jnp.stack([G, H, I], -1)], -2)
    return adj / det[..., None, None]


def camera_batch_jax(key, batch: int, packed_size: int = 128,
                     full_hw: Optional[Tuple[int, int]] = None
                     ) -> Dict[str, jnp.ndarray]:
    """Physically-grounded camera simulation (VERDICT r3 next #5).

    Pairs are (noisy mosaicked sensor raw) -> (per-image-ISP'd sRGB), with
    exactly the structure the RealCamNet contributions target
    (`raw2bit.py:1614`: GFT global color transform, LFT local transform,
    CADR coord-aware shading removal):

      * scene: multi-scale correlated linear RGB (compressible content);
      * per-image WHITE BALANCE gains + COLOR MATRIX jitter: the sensor
        sees `scene @ inv(M_img)ᵀ / wb` — inverting this per image needs a
        GLOBAL conditioning path (the GFT classifier's role); window-local
        convs/attention must infer it indirectly;
      * per-image LENS SHADING: decentered radial falloff evaluated at the
        patch's position in the FULL frame via `coord` (patches are random
        crops of a 4x virtual sensor, so shading is not inferable from the
        patch alone — the CADR/LSC branch's role);
      * RGGB mosaic with slight G2 imbalance, Poisson-Gaussian sensor noise
        (per-image shot/read levels), 10-bit quantization;
      * target: the CLEAN scene through a per-image tone curve (gamma +
        s-curve blend) — denoise + demosaic + inverse-camera in one map.

    Shapes match `synthetic_batch_jax`: raw/cond (B,s,s,4), coord (B,s,s,2),
    target (B,2s,2s,3). jit-friendly (device-side batch source for the
    lax.scan trainer).
    """
    s = packed_size
    fh, fw = full_hw if full_hw is not None else (4 * s, 4 * s)
    ks = jax.random.split(key, 14)

    # Scene: multi-scale correlated field at output res (2s, 2s).
    shape = lambda d: (batch, max(2 * s // d, 1), max(2 * s // d, 1), 3)
    up = lambda x, m="bilinear": jax.image.resize(x, (batch, 2 * s, 2 * s, 3), m)
    field = (1.2 * up(jax.random.normal(ks[0], shape(32), jnp.float32))
             + 0.4 * up(jax.random.normal(ks[1], shape(8), jnp.float32))
             + 0.15 * up(jax.random.normal(ks[2], shape(2), jnp.float32))
             + 0.3 * up(jax.random.normal(ks[3], shape(16), jnp.float32),
                        "nearest"))
    scene = jax.nn.sigmoid(1.5 * field)  # linear RGB, (B, 2s, 2s, 3)

    # Per-image camera model: sensor = scene @ inv(M)^T / wb.
    wb_r = jax.random.uniform(ks[4], (batch,), jnp.float32, 1.6, 2.6)
    wb_b = jax.random.uniform(ks[5], (batch,), jnp.float32, 1.4, 2.4)
    wb = jnp.stack([wb_r, jnp.ones_like(wb_r), wb_b], -1)  # (B, 3)
    m = (jnp.eye(3)[None]
         + 0.25 * jax.random.normal(ks[6], (batch, 3, 3), jnp.float32))
    m = m / jnp.sum(m, axis=-1, keepdims=True)  # rows sum 1: neutral axis
    a_img = _inv3(m) / wb[:, :, None]           # (B, 3, 3): rows = out chans
    sensor = jnp.clip(jnp.einsum("bhwc,bkc->bhwk", scene, a_img), 0.0, 1.0)

    # Patch position in the full (virtual) sensor; coord in [-1, 1] at
    # packed res (matches coord_map semantics).
    fhp, fwp = fh // 2, fw // 2
    y0 = jax.random.randint(ks[7], (batch,), 0, max(fhp - s, 1))
    x0 = jax.random.randint(ks[8], (batch,), 0, max(fwp - s, 1))
    ar = jnp.arange(s, dtype=jnp.float32)
    yy = (y0[:, None].astype(jnp.float32) + ar[None]) / max(fhp - 1, 1) * 2 - 1
    xx = (x0[:, None].astype(jnp.float32) + ar[None]) / max(fwp - 1, 1) * 2 - 1
    yy = jnp.broadcast_to(yy[:, :, None], (batch, s, s))
    xx = jnp.broadcast_to(xx[:, None, :], (batch, s, s))
    coord = jnp.stack([yy, xx], -1)

    # Decentered per-image lens shading, evaluated at full-frame coords.
    k1 = jax.random.uniform(ks[9], (batch,), jnp.float32, 0.3, 0.9)
    k2 = jax.random.uniform(ks[10], (batch,), jnp.float32, 0.0, 0.4)
    cy = jax.random.uniform(ks[11], (batch, 2), jnp.float32, -0.15, 0.15)
    r2 = ((yy - cy[:, 0, None, None]) ** 2 + (xx - cy[:, 1, None, None]) ** 2)
    shade = 1.0 / (1.0 + k1[:, None, None] * r2 + k2[:, None, None] * r2 ** 2)

    # RGGB mosaic (packed) with slight G2 imbalance, then shading.
    r_ch = sensor[:, 0::2, 0::2, 0]
    g1 = sensor[:, 0::2, 1::2, 1]
    g2 = 0.985 * sensor[:, 1::2, 0::2, 1] + 0.015 * sensor[:, 1::2, 0::2, 2]
    b_ch = sensor[:, 1::2, 1::2, 2]
    packed = jnp.stack([r_ch, g1, g2, b_ch], -1) * shade[..., None]

    # Poisson-Gaussian noise + 10-bit quantization.
    shot = jax.random.uniform(ks[12], (batch,), jnp.float32, 5e-4, 4e-3)
    read = jax.random.uniform(ks[13], (batch,), jnp.float32, 1e-5, 1e-4)
    std = jnp.sqrt(shot[:, None, None, None] * packed
                   + read[:, None, None, None])
    noise = jax.random.normal(jax.random.fold_in(key, 99), packed.shape,
                              jnp.float32)
    raw = jnp.clip(packed + std * noise, 0.0, 1.0)
    raw = jnp.round(raw * 1023.0) / 1023.0

    # Target: clean scene through a per-image tone curve.
    gamma = jax.random.uniform(jax.random.fold_in(key, 98), (batch,),
                               jnp.float32, 2.0, 2.4)
    wgt = jax.random.uniform(jax.random.fold_in(key, 97), (batch,),
                             jnp.float32, 0.2, 0.8)
    t = scene ** (1.0 / gamma[:, None, None, None])
    scurve = t * t * (3.0 - 2.0 * t)
    target = jnp.clip((1 - wgt[:, None, None, None]) * t
                      + wgt[:, None, None, None] * scurve, 0.0, 1.0)
    return {"raw": raw, "cond": raw, "coord": coord, "target": target}


def camera_eval_batches_jax(seed: int, num: int, packed_size: int = 128,
                            batch: int = 1) -> Iterator[Dict[str, jnp.ndarray]]:
    """Deterministic eval batches from `camera_batch_jax`'s distribution."""
    for i in range(num):
        key = jax.random.fold_in(jax.random.key(seed), i)
        yield camera_batch_jax(key, batch, packed_size)


class PairedRawDataset:
    """Folder of .npz files with arrays {raw, rgb[, full_hw]}.

    raw: (H, W[, 1]) float Bayer in [0,1]; rgb: (H, W, 3) float sRGB target
    at the same resolution as the unpacked raw (model output is 2x the packed
    resolution = unpacked resolution). Iterates random packed patches.
    """

    def __init__(self, root: str, patch: int = 128, seed: int = 0,
                 train: bool = True):
        self.files: List[str] = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".npz")
        )
        if not self.files:
            raise FileNotFoundError(f"no .npz files in {root}")
        self.patch = patch
        self.train = train
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.files)

    def sample(self, idx: Optional[int] = None) -> Dict[str, np.ndarray]:
        f = self.files[idx if idx is not None else self.rng.randint(len(self.files))]
        with np.load(f) as z:
            raw = np.asarray(z["raw"], np.float32)
            rgb = np.asarray(z["rgb"], np.float32)
            full_hw = tuple(z["full_hw"]) if "full_hw" in z else None
        packed = pack_bayer_np(raw)
        ph, pw = packed.shape[:2]
        p = self.patch
        if self.train and (ph > p and pw > p):
            y0 = self.rng.randint(ph - p + 1)
            x0 = self.rng.randint(pw - p + 1)
        else:
            y0 = x0 = 0
            p = min(p, ph, pw)
        patch = packed[y0 : y0 + p, x0 : x0 + p]
        target = rgb[2 * y0 : 2 * (y0 + p), 2 * x0 : 2 * (x0 + p)]
        coord = coord_map(p, p, (y0, x0), full_hw or (ph, pw))
        # Cond image = the whole packed raw resized is ideal; patch is the
        # practical default (reference models accept either).
        return {"raw": patch, "cond": patch, "coord": coord, "target": target}

    def batches(self, batch_size: int, steps: int) -> Iterator[Dict[str, np.ndarray]]:
        for _ in range(steps):
            samples = [self.sample() for _ in range(batch_size)]
            yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def prefetch_to_device(it: Iterator, size: int = 2, sharding=None) -> Iterator:
    """Background-thread prefetch + device_put (double buffering)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def producer():
        for item in it:
            if sharding is not None:
                item = jax.tree.map(lambda x: jax.device_put(x, sharding), item)
            else:
                item = jax.tree.map(jax.device_put, item)
            q.put(item)
        q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
