"""Pallas TPU kernel: fused RCAB double-conv chain for the ISP workhorse.

An RCABlock (`networks.py:296-311`) is `x + CA(conv(relu(conv(x))))`. Compiled
naively, every block round-trips HBM ~6-7 times at full resolution (conv1
in/out, conv2 in/out, the CA reduce, and the gated residual fma) — the
measured 4K bottleneck (ROADMAP: ~69% of HBM peak, MXU mostly idle).

This kernel fuses, per (H,W) tile held in VMEM:

    xin  = x + res_prev * gate          (previous block's CA-gated residual)
    h    = relu(conv3x3(xin) + b1)
    res  = conv3x3(h) + b2
    sums = sum_{H,W}(res)               (per-channel, for the next CA gate)

so one RCAB costs 2 tile reads + 2 tile writes instead of ~7. The CA gate
itself is a (B,C)-sized sigmoid-MLP left to XLA between kernel calls — the
global mean over H,W forces that barrier (it needs every tile's sums).

Halos: each grid cell DMAs its tile plus a 2-pixel halo from HBM (dynamic
start, static size; border tiles shift + zero-fill in VMEM), so no padded
copy of the input is ever materialized. Zero-padding semantics match torch
Conv2d(padding=1): the intermediate h is re-zeroed outside the image before
the second conv. Tiles are 2-D ((tile_h, tile_w) <= (8, 512)) so VMEM holds
at 4K widths even with the 128-lane padding of small channel counts.

Used by `RCAGroup(fused=True)` (ops/blocks.py); backward falls back to the
XLA reference implementation via custom_vjp (rematerialized), so training
with the flag on is allowed but the win is on inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_valid(x, w, out_rows, out_cols):
    """Sum of 9 shifted contractions: x (R,S,C) valid-conv w (3,3,C,Co)."""
    acc = None
    for di in range(3):
        for dj in range(3):
            part = jax.lax.dot_general(
                x[di:di + out_rows, dj:dj + out_cols, :], w[di, dj],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return acc


def _tile_dma(src_hbm, dst, sem, b, i, j, th, tw, h, w):
    """Copy the halo window around tile (i, j) of src[b] into dst
    ((th+4, tw+16, c)), zero-filling out-of-image rows/cols.

    Mosaic requires DMA slice offsets/sizes along the sublane (W) dim to be
    8-aligned, so the W halo band is 8 wide (compute uses only 2 of it):
    global col g lands at dst col g - (col0 - 8), i.e. the tile body spans
    dst cols [8, tw+8) and the compute window [col0-2, col0+tw+2) sits at
    the static dst cols [6, tw+10). H is an untiled major dim — row slices
    can be exact (2-halo, any offset/size).

    Border handling: the dst border bands are zeroed first, then one of 9
    statically-shaped DMAs (interior/edge x interior/edge) writes the
    in-image sub-rectangle. All sizes static; starts dynamic.
    """
    nh, nw = h // th, w // tw
    row0, col0 = i * th, j * tw

    dst[0:2, :, :] = jnp.zeros_like(dst[0:2, :, :])
    dst[th + 2:th + 4, :, :] = jnp.zeros_like(dst[th + 2:th + 4, :, :])
    dst[:, 0:8, :] = jnp.zeros_like(dst[:, 0:8, :])
    dst[:, tw + 8:tw + 16, :] = jnp.zeros_like(dst[:, tw + 8:tw + 16, :])

    # (cond, src_start, copy_size, dst_start) per dim; traced conds, static
    # sizes. Top/left edge drops the leading halo, bottom/right the trailing.
    # Interior cases are appended only when they can occur (their DMA slice
    # sizes exceed the array extent otherwise — pl.when bodies still trace).
    if nh == 1:
        rows = [(i == 0, 0, th, 2)]
    else:
        rows = [(i == 0, 0, th + 2, 2),
                (jnp.logical_and(i == nh - 1, i > 0), h - th - 2, th + 2, 0)]
        if nh > 2:
            rows.append(
                (jnp.logical_and(i > 0, i < nh - 1), row0 - 2, th + 4, 0))
    if nw == 1:
        cols = [(j == 0, 0, tw, 8)]
    else:
        cols = [(j == 0, 0, tw + 8, 8),
                (jnp.logical_and(j == nw - 1, j > 0), w - tw - 8, tw + 8, 0)]
        if nw > 2:
            cols.append(
                (jnp.logical_and(j > 0, j < nw - 1), col0 - 8, tw + 16, 0))
    for rcond, rs, rn, rd in rows:
        for ccond, cs, cn, cd in cols:
            @pl.when(jnp.logical_and(rcond, ccond))
            def _(rs=rs, rn=rn, rd=rd, cs=cs, cn=cn, cd=cd):
                cp = pltpu.make_async_copy(
                    src_hbm.at[b, pl.ds(rs, rn), pl.ds(cs, cn), :],
                    dst.at[rd:rd + rn, cd:cd + cn, :], sem)
                cp.start()
                cp.wait()


def _rcab_kernel(x_hbm, res_hbm, gate_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 xout_ref, res_ref, sums_ref, xs, rs, sem1, sem2,
                 *, th, tw, h, w, fold):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    _tile_dma(x_hbm, xs, sem1, b, i, j, th, tw, h, w)
    if fold:
        _tile_dma(res_hbm, rs, sem2, b, i, j, th, tw, h, w)
        xin = (xs[:, 6:tw + 10, :]
               + rs[:, 6:tw + 10, :] * gate_ref[0].astype(xs.dtype)[None, None, :])
    else:
        xin = xs[:, 6:tw + 10, :]

    h1 = _conv3x3_valid(xin, w1_ref[:], th + 2, tw + 2)
    h1 = jnp.maximum(h1 + b1_ref[0].astype(jnp.float32)[None, None, :], 0.0)
    # conv2's zero padding applies to h, not to x: zero h rows/cols that fall
    # outside the image (the halo rows carry real conv values of the
    # zero-extended x there, which the reference never sees).
    grow = i * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2), 0)
    gcol = j * tw - 1 + jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2), 1)
    valid = ((grow >= 0) & (grow < h) & (gcol >= 0) & (gcol < w))
    h1 = (h1 * valid.astype(h1.dtype)[:, :, None]).astype(xin.dtype)
    r = _conv3x3_valid(h1, w2_ref[:], th, tw)
    r = r + b2_ref[0].astype(jnp.float32)[None, None, :]

    xout_ref[0] = xin[2:th + 2, 2:tw + 2, :]
    res_ref[0] = r.astype(res_ref.dtype)
    # Channel sums accumulate into one (8, C) block revisited across the
    # (i, j) tiles of each batch element (Mosaic wants >=8 sublanes).
    s = jnp.sum(r, axis=(0, 1))[None, :]
    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(first)
    def _():
        sums_ref[0, 0:1, :] = s

    @pl.when(jnp.logical_not(first))
    def _():
        sums_ref[0, 0:1, :] = sums_ref[0, 0:1, :] + s


def _ref_impl(x, res_prev, gate, w1, b1, w2, b2):
    """XLA reference (same math, used for init/backward/fallback)."""
    xin = x
    if res_prev is not None:
        xin = x + res_prev * gate[:, None, None, :].astype(x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    h = jax.lax.conv_general_dilated(xin, w1.astype(x.dtype), (1, 1),
                                     ((1, 1), (1, 1)), dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1.astype(jnp.float32), 0.0).astype(x.dtype)
    r = jax.lax.conv_general_dilated(h, w2.astype(x.dtype), (1, 1),
                                     ((1, 1), (1, 1)), dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
    r = r + b2.astype(jnp.float32)
    sums = jnp.sum(r, axis=(1, 2))
    return xin, r.astype(x.dtype), sums


def _pick_tile(dim: int, cap: int, mult8: bool = False) -> int:
    """Largest divisor of dim that is <= cap and <= dim - 4 (so the halo
    window fits and there are >= 2 tiles) and >= 2 (interior-tile halo
    arithmetic needs tile >= halo width); 0 if none. With mult8=True the
    tile must also be a multiple of 8 (Mosaic sublane constraint on the
    output block's second-to-last dim)."""
    step = 8 if mult8 else 1
    lo = min(cap, dim - 4)
    for t in range(lo - lo % step if mult8 else lo, 1, -step):
        if t >= 2 and dim % t == 0:
            return t
    return 0


def _fwd_impl(x, res_prev, gate, w1, b1, w2, b2, tile_h, tile_w, interpret):
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # Mosaic kernels only run on TPU; CPU = tests
    bsz, h, w, c = x.shape
    th = _pick_tile(h, tile_h)
    tw = _pick_tile(w, tile_w, mult8=True)
    if not th or not tw:  # tiny maps (coarse UNet levels): XLA is fine
        return _ref_impl(x, res_prev, gate, w1, b1, w2, b2)
    fold = res_prev is not None
    if not fold:
        res_prev = jnp.zeros((1, 1, 1, c), x.dtype)
        gate = jnp.zeros((bsz, c), jnp.float32)
    nh, nw = h // th, w // tw
    wdt = x.dtype

    kernel = functools.partial(_rcab_kernel, th=th, tw=tw, h=h, w=w, fold=fold)
    xout, res, sums = pl.pallas_call(
        kernel,
        grid=(bsz, nh, nw),
        in_specs=[
            # x / res_prev stay in HBM (tiles DMA'd manually): VMEM-resident
            # sources reject sub-tile DMA slices (C=48 < 128-lane tiling).
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, c), lambda b, i, j: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda b, i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda b, i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw, c), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw, c), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, c), wdt),
            jax.ShapeDtypeStruct((bsz, h, w, c), wdt),
            jax.ShapeDtypeStruct((bsz, 8, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 4, tw + 16, c), wdt),
            pltpu.VMEM((th + 4, tw + 16, c), wdt),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, res_prev, gate.astype(jnp.float32),
      w1.astype(wdt), b1.reshape(1, c).astype(jnp.float32),
      w2.astype(wdt), b2.reshape(1, c).astype(jnp.float32))
    return xout, res, sums[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_rcab_convs(x, res_prev, gate, w1, b1, w2, b2,
                     tile_h: int = 8, tile_w: int = 512,
                     interpret: bool = False):
    """(xin, res, channel_sums) with xin = x + res_prev*gate (fold skipped
    when res_prev is None), res = conv3x3(relu(conv3x3(xin)+b1))+b2.

    x: (B,H,W,C); res_prev: (B,H,W,C) | None; gate: (B,C) | None;
    w1/w2: (3,3,C,C) HWIO; b1/b2: (C,).
    """
    return _fwd_impl(x, res_prev, gate, w1, b1, w2, b2, tile_h, tile_w,
                     interpret)


def _vjp_fwd(x, res_prev, gate, w1, b1, w2, b2, tile_h, tile_w, interpret):
    out = _fwd_impl(x, res_prev, gate, w1, b1, w2, b2, tile_h, tile_w,
                    interpret)
    return out, (x, res_prev, gate, w1, b1, w2, b2)


def _vjp_bwd(tile_h, tile_w, interpret, saved, g):
    x, res_prev, gate, w1, b1, w2, b2 = saved
    if res_prev is None:
        def f(x_, w1_, b1_, w2_, b2_):
            return _ref_impl(x_, None, None, w1_, b1_, w2_, b2_)

        _, vjp = jax.vjp(f, x, w1, b1, w2, b2)
        dx, dw1, db1, dw2, db2 = vjp(g)
        return dx, None, None, dw1, db1, dw2, db2
    _, vjp = jax.vjp(functools.partial(_ref_impl), x, res_prev, gate,
                     w1, b1, w2, b2)
    return vjp(g)


fused_rcab_convs.defvjp(_vjp_fwd, _vjp_bwd)


def _ca_gate(sums, hw, p_ca):
    """CA gate from channel sums: sigmoid(up(relu(dn(mean)))) -> (B, C).

    p_ca: CALayer param subtree {'down': {'conv': {kernel,bias}}, 'up': ...}
    with 1x1 HWIO kernels (ops/blocks.py CALayer).
    """
    mean = (sums / hw).astype(jnp.float32)
    kd = p_ca["down"]["conv"]["kernel"][0, 0].astype(jnp.float32)
    bd = p_ca["down"]["conv"]["bias"].astype(jnp.float32)
    ku = p_ca["up"]["conv"]["kernel"][0, 0].astype(jnp.float32)
    bu = p_ca["up"]["conv"]["bias"].astype(jnp.float32)
    y = jnp.maximum(mean @ kd + bd, 0.0)
    return jax.nn.sigmoid(y @ ku + bu)


def fused_rcag_apply(p, x, nb: int, *, tile_h: int = 8, tile_w: int = 512,
                     interpret: bool = False):
    """Apply an RCAGroup (param subtree from ops.blocks.RCAGroup) with the
    fused kernel chain: nb fused RCABs + XLA tail conv + outer residual.

    Matches `RCAGroup.__call__` numerics to fp tolerance (mode 'CRC',
    any reduction baked into the CA param shapes).
    """
    hw = x.shape[1] * x.shape[2]
    base, res, gate = x, None, None
    for i in range(nb):
        blk = p[f"rcab{i}"]
        base, res, sums = fused_rcab_convs(
            base, res, gate,
            blk["res"]["0_conv"]["conv"]["kernel"],
            blk["res"]["0_conv"]["conv"]["bias"],
            blk["res"]["2_conv"]["conv"]["kernel"],
            blk["res"]["2_conv"]["conv"]["bias"],
            tile_h, tile_w, interpret)
        gate = _ca_gate(sums, hw, blk["ca"])
    out = base + res * gate[:, None, None, :].astype(x.dtype)
    wt = p["tail"]["conv"]["kernel"].astype(x.dtype)
    bt = p["tail"]["conv"]["bias"].astype(jnp.float32)
    tail = jax.lax.conv_general_dilated(
        out, wt, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + bt
    return tail.astype(x.dtype) + x
