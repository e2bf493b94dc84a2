"""Pallas TPU kernel: fused window attention (qk^T + bias + mask + softmax +
pv in VMEM).

The unfused WMSA chain materializes the (G, P^2, P^2) similarity tensor in
HBM between two batched matmuls (softmax cannot fuse through them); for 8x8
windows that's 64x64 floats per (window, head) round-tripping HBM twice.
This kernel keeps the whole per-window attention in VMEM: one grid cell
processes every head of `WIN_BLK` windows.

Shifted-window masking (reference `tcm.py:160-206`) is compressed to its
information content: the TWO (P^2, P^2) seam patterns (row-seam / col-seam,
trace-time constants) plus a per-window (G, 2) flag pair saying whether the
window sits on the last window-row / window-column. The kernel reassembles
the additive mask in VMEM — nothing O(G * P^4) ever touches HBM (the r2
design DMA'd a dense (G, P^2, P^2) f32 mask: ~134 MB per attention layer at
the joint codec's 4K stage-1 shape, all zeros for unshifted windows).
Unshifted windows skip the mask entirely (separate kernel instantiation).

Used by `WMSA` when `use_pallas=True` (see wmsa.py); numerics match the
reference semantics (`tcm.py:186-206`) to fp tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, scale, seam):
    """One grid cell: (WIN_BLK windows x heads) of P^2-token attention.

    q/k/v: (WIN_BLK, heads, P2, hd); bias: (heads, P2, P2);
    if seam: rest = (row_pat (P2,P2), col_pat (P2,P2), flags (WIN_BLK,2)).
    o: (WIN_BLK, heads, P2, hd).
    """
    o_ref = rest[-1]
    blk, heads, p2, hd = q_ref.shape
    # Mosaic tpu.matmul supports at most ONE batch dim: merge (win, head)
    # into a single batch axis for the two matmuls, unmerge for the
    # per-head bias / per-window mask adds.
    q = q_ref[:].astype(jnp.float32).reshape(blk * heads, p2, hd)
    k = k_ref[:].astype(jnp.float32).reshape(blk * heads, p2, hd)
    v = v_ref[:].astype(jnp.float32).reshape(blk * heads, p2, hd)
    sim = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    sim = sim.reshape(blk, heads, p2, p2)
    sim = sim + bias_ref[:].astype(jnp.float32)[None]
    if seam:
        row_ref, col_ref, flags_ref = rest[:3]
        flags = flags_ref[:].astype(jnp.float32)  # (blk, 2)
        mask = (flags[:, 0].reshape(blk, 1, 1) * row_ref[:][None]
                + flags[:, 1].reshape(blk, 1, 1) * col_ref[:][None])
        sim = sim + mask[:, None]
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.reshape(blk * heads, p2, p2), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.reshape(blk, heads, p2, hd).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def window_attention(q, k, v, bias, scale: float,
                     win_blk: int = 8, interpret: bool = False,
                     seam=None):
    """Fused windowed MHA.

    q/k/v: (G, heads, P2, hd) with G = B * nW windows;
    bias: (heads, P2, P2) relative-position bias;
    seam: None for unshifted windows, else (row_pat, col_pat, flags) with
      row/col_pat (P2, P2) additive constants (0 / -1e9) and flags (G, 2)
      last-window-row / last-window-col indicators.
    Returns (G, heads, P2, hd).
    """
    return _window_attention_fwd_impl(q, k, v, bias, seam, scale, win_blk,
                                      interpret)


def _seam_mask(seam, g):
    if seam is None:
        return 0.0
    row_pat, col_pat, flags = seam
    f = flags.astype(jnp.float32)
    return (f[:, 0, None, None] * row_pat.astype(jnp.float32)[None]
            + f[:, 1, None, None] * col_pat.astype(jnp.float32)[None])


def _probs(q, k, bias, seam, scale):
    sim = jnp.einsum("ghpc,ghqc->ghpq", q.astype(jnp.float32),
                     k.astype(jnp.float32)) * scale
    sim = sim + bias.astype(jnp.float32)[None]
    if seam is not None:
        sim = sim + _seam_mask(seam, q.shape[0])[:, None]
    return jax.nn.softmax(sim, axis=-1)


def _wa_fwd(q, k, v, bias, scale, win_blk, interpret, seam=None):
    out = _window_attention_fwd_impl(q, k, v, bias, seam, scale, win_blk,
                                     interpret)
    return out, (q, k, v, bias, seam)


def _wa_bwd(scale, win_blk, interpret, res, g):
    # Standard attention backward; probabilities recomputed (flash-style
    # rematerialization). Plain XLA for now — the forward is the hot path.
    q, k, v, bias, seam = res
    p = _probs(q, k, bias, seam, scale)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("ghpq,ghpc->ghqc", p, g32)
    dp = jnp.einsum("ghpc,ghqc->ghpq", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = scale * jnp.einsum("ghpq,ghqc->ghpc", ds, k.astype(jnp.float32))
    dk = scale * jnp.einsum("ghpq,ghpc->ghqc", ds, q.astype(jnp.float32))
    dbias = jnp.sum(ds, axis=0)
    if seam is None:
        dseam = None
    else:  # seam terms are shape-derived constants: zero cotangents
        dseam = tuple(jnp.zeros_like(s) for s in seam)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dseam)


window_attention.defvjp(_wa_fwd, _wa_bwd)


def _window_attention_fwd_impl(q, k, v, bias, seam, scale, win_blk, interpret):
    g, heads, p2, hd = q.shape
    if g % 8:
        # Mosaic requires the windows-block sublane extent to be a multiple
        # of 8 (the flags operand is (blk, 2)); pad with dummy windows and
        # crop the result. Softmax over the zero pads is well-defined
        # (uniform), and their outputs are discarded.
        g8 = -(-g // 8) * 8
        pad = [(0, g8 - g)] + [(0, 0)] * 3
        out = _window_attention_fwd_impl(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), bias,
            None if seam is None else (
                seam[0], seam[1], jnp.pad(seam[2], ((0, g8 - g), (0, 0)))),
            scale, win_blk, interpret)
        return out[:g]
    # Largest multiple-of-8 divisor of g that is <= win_blk (g % 8 == 0 here:
    # smaller g took the pad branch above, so blk=8 always qualifies).
    blk = next(b for b in range(max(min(win_blk, g), 8), 7, -1)
               if g % b == 0 and b % 8 == 0)

    # Kernel stack budget, LANE-PADDING AWARE: VMEM tiles pad the last dim
    # to 128 lanes, so a (blk, hb, p2, hd=8) block really costs
    # blk*hb*p2*128 floats — q/k/v/out at 16x their logical size. With many
    # heads per block (the joint codec's stage-1: 8160 windows x 8 heads of
    # hd=8) that overflows the ~16 MB scoped-vmem limit; split heads across
    # the grid until the estimate fits.
    lane = lambda d: -(-d // 128) * 128

    def stack_est(hb):
        qkv = 4 * blk * hb * p2 * lane(hd) * 4          # q, k, v, out blocks
        sim = 3 * blk * hb * p2 * lane(p2) * 4          # sim + exp + weighted
        return qkv + sim + hb * p2 * lane(p2) * 4       # + bias block

    hb = heads
    while hb > 1 and stack_est(hb) > 8 * 2 ** 20:
        hb -= 1
    while heads % hb:
        hb -= 1
    grid = (g // blk, heads // hb)

    qkv_spec = pl.BlockSpec((blk, hb, p2, hd), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    pat_spec = pl.BlockSpec((p2, p2), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        qkv_spec, qkv_spec, qkv_spec,
        pl.BlockSpec((hb, p2, p2), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q, k, v, bias]
    if seam is not None:
        row_pat, col_pat, flags = seam
        in_specs += [pat_spec, pat_spec,
                     pl.BlockSpec((blk, 2), lambda i, j: (i, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [row_pat, col_pat, flags]
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, seam=seam is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(*operands)
