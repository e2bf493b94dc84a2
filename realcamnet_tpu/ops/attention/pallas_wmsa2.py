"""Fused window attention, take 2: heads-in-SUBLANES layout.

Why the r3 kernel (pallas_wmsa.py) lost on hardware: it consumed q/k/v
pre-split as (..., p², hd) with hd = 8/16 in the LANE dimension — every
materialized operand was 8-16x lane-padded, and the per-head (p²,hd)@(hd,p²)
matmuls ran at K=hd -> ~6% MXU depth fill. Measured on chip
(artifacts/wmsa_cost_probe_r04.json): the XLA attention einsums alone cost
24.9 ms at the 4K stage-1 shape — ~80% of a 28 ms Swin block — for the same
reasons.

This kernel takes the WINDOWED FEATURE MAP (G, p², C) plus the qkv/proj
weights and runs projection + attention + output projection in one pass:

  * qkv: one batched (WB·p², C) @ (C, 3C) matmul — K=C=64.
  * scores in the (H·p²_key, p²_query) layout: heads stacked in SUBLANES,
    queries in lanes. Built per window as
        S = (tile(K, H) ⊙ head_mask) @ Qᵀ      -- K=C matmul, M=H·p²
    so no tensor anywhere has a trailing dim under 64.
  * softmax over keys = a reduction over the MIDDLE axis of the free
    (H, p², p²) reshape — natural VPU sublane reduction.
  * AV as one deep matmul: Oᵀ = (tile(Vᵀ, H) ⊙ mask) @ P  — K = H·p².
  * scores/probabilities never leave VMEM (the XLA path materializes
    ~1 GB of f32 scores per stage-1 pass at 4K).
  * 64x64 transposes are done on the MXU (dot with identity) — no reliance
    on Mosaic transpose support.

Relative-position bias and the SW seam masks arrive pre-laid-out as
(H·p², p²) trace-time constants + per-window (G, 2) seam flags
(same compressed-seam interface as pallas_wmsa.py).

Reference semantics: `models/tcm.py:139-212` (WMSA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _t(x):
    """MXU transpose: dot_general(X, I, contract rows) == Xᵀ (exact for
    bf16/f32 — each output element is a single product by 1.0)."""
    n = x.shape[0]
    eye = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    out = jax.lax.dot_general(x, eye.astype(x.dtype),
                              dimension_numbers=(((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(x.dtype)  # exact: single product by 1.0 per element


def _attn_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                 bias_ref, row_ref, col_ref, flags_ref, out_ref,
                 *, wb, p2, c, heads, scale, seam, out_dtype,
                 paired=False):
    x2 = x_ref[0].reshape(wb * p2, c)
    qkv = jax.lax.dot_general(
        x2, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(x2.dtype)

    hd = c // heads
    # head_mask[h*p2 + k, ch] = (ch // hd == h); mask_t is its (c, H*p2)
    # transpose. Built from iota at trace time per kernel instance.
    rows = jax.lax.broadcasted_iota(jnp.int32, (heads * p2, c), 0) // p2
    cols = jax.lax.broadcasted_iota(jnp.int32, (heads * p2, c), 1) // hd
    head_mask = (rows == cols).astype(x2.dtype)
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (c, heads * p2), 0) // hd
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (c, heads * p2), 1) // p2
    mask_t = (rows_t == cols_t).astype(x2.dtype)

    def scores(w):
        q = qkv[w * p2:(w + 1) * p2, 0:c]
        k = qkv[w * p2:(w + 1) * p2, c:2 * c]
        ks = jnp.tile(k, (heads, 1)) * head_mask     # (H*p2, C)
        s = jax.lax.dot_general(
            ks, _t(q), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (H*p2_k, p2_q)
        s = s + bias_ref[...]
        if seam:
            f = flags_ref[0]
            s = s + f[w, 0] * row_ref[...] + f[w, 1] * col_ref[...]
        return s

    def av(w, p):
        v = qkv[w * p2:(w + 1) * p2, 2 * c:3 * c]
        vs = jnp.tile(_t(v), (1, heads)) * mask_t    # (C, H*p2)
        ot = jax.lax.dot_general(
            vs, p, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (C, p2_q)
        return _t(ot.astype(x2.dtype))               # (p2, C)

    def softmax_k(s, nq):
        s3 = s.reshape(heads, p2, nq)
        m = jnp.max(s3, axis=1, keepdims=True)
        e = jnp.exp(s3 - m)
        z = jnp.sum(e, axis=1, keepdims=True)
        return (e / z).reshape(heads * p2, nq).astype(x2.dtype)

    os_ = []
    if paired:
        # Two windows' scores side by side in LANES: the softmax/exp VPU
        # passes (the kernel's largest elementwise cost) run at full 128-
        # lane occupancy instead of 50% at p2 = 64. The key-reduction is
        # lane-wise independent, so concatenation is exact.
        for w in range(0, wb, 2):
            sp = jnp.concatenate([scores(w), scores(w + 1)], axis=1)
            p_all = softmax_k(sp, 2 * p2)
            os_.append(av(w, p_all[:, :p2]))
            os_.append(av(w + 1, p_all[:, p2:]))
    else:
        for w in range(wb):
            os_.append(av(w, softmax_k(scores(w), p2)))
    # One batched output projection for the whole window block: M = wb*p2
    # fills the MXU rows (per-window dots would run at M=64).
    o_all = jnp.concatenate(os_, axis=0)             # (wb*p2, C)
    y_all = jax.lax.dot_general(
        o_all, wproj_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bproj_ref[...].astype(jnp.float32)
    out_ref[0] = y_all.astype(out_dtype).reshape(wb, p2, c)


def wmsa_fused(xw, wqkv, bqkv, wproj, bproj, bias_kq, scale,
               heads: int, seam=None, wb: int = 16,
               interpret: bool = False, paired: bool = True):
    """Fused qkv+window-attention+proj.

    xw: (G, p², C) windowed (LayerNorm'ed) features.
    wqkv (C, 3C), bqkv (3C,), wproj (C, C), bproj (C,).
    bias_kq: (H·p², p²) f32 — rel-pos bias in [h·p²+key, query] layout
      (= bias(h, query, key) transposed per head).
    seam: (row_kq, col_kq, flags) — (H·p², p²) f32 patterns + (G, 2) flags.
    paired (default): softmax/exp over two windows side by side in lanes —
      full 128-lane VPU occupancy at p² = 64; bit-identical, measured
      10.2 -> 8.9 ms at the 4K stage-1 shape.
    Returns (G, p², C).
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    g, p2, c = xw.shape
    dt = xw.dtype
    do_seam = seam is not None
    gp = -(-g // wb) * wb
    if gp != g:
        xw = jnp.pad(xw, ((0, gp - g), (0, 0), (0, 0)))
    if do_seam:
        row_kq, col_kq, flags = seam
        if gp != g:
            flags = jnp.pad(flags, ((0, gp - g), (0, 0)))
    else:
        row_kq = jnp.zeros((1, 1), jnp.float32)
        col_kq = jnp.zeros((1, 1), jnp.float32)
        flags = jnp.zeros((gp, 2), jnp.float32)

    kernel = functools.partial(
        _attn_kernel, wb=wb, p2=p2, c=c, heads=heads, scale=scale,
        seam=do_seam, out_dtype=dt, paired=paired and wb % 2 == 0)
    hp2 = heads * p2
    out = pl.pallas_call(
        kernel,
        grid=(gp // wb,),
        in_specs=[
            pl.BlockSpec((1, wb, p2, c), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp2, p2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(row_kq.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(col_kq.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wb, 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wb, p2, c), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, gp, p2, c), dt),
        interpret=interpret,
    )(xw[None], wqkv.astype(dt), bqkv.astype(jnp.float32),
      wproj.astype(dt), bproj.astype(jnp.float32),
      bias_kq.astype(jnp.float32), row_kq.astype(jnp.float32),
      col_kq.astype(jnp.float32), flags.astype(jnp.float32)[None])
    return out[0, :g]
