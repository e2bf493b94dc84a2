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
