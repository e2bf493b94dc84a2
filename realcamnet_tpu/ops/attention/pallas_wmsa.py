"""Pallas TPU kernel: fused window attention (qk^T + bias + mask + softmax +
pv in VMEM).

The unfused WMSA chain materializes the (G, P^2, P^2) similarity tensor in
HBM between two batched matmuls (softmax cannot fuse through them); for 8x8
windows that's 64x64 floats per (window, head) round-tripping HBM twice.
This kernel keeps the whole per-window attention in VMEM: one grid cell
processes every head of `WIN_BLK` windows.

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


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale):
    """One grid cell: (WIN_BLK windows x heads) of P^2-token attention.

    q/k/v: (WIN_BLK, heads, P2, hd); bias: (heads, P2, P2);
    mask: (WIN_BLK, P2, P2) additive; o: (WIN_BLK, heads, P2, hd).
    """
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
    sim = sim + mask_ref[:].astype(jnp.float32)[:, None]
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.reshape(blk * heads, p2, p2), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.reshape(blk, heads, p2, hd).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def window_attention(q, k, v, bias, mask, scale: float,
                     win_blk: int = 8, interpret: bool = False):
    """Fused windowed MHA.

    q/k/v: (G, heads, P2, hd) with G = B * nW windows;
    bias: (heads, P2, P2) relative-position bias;
    mask: (G, P2, P2) additive mask (0 / large-negative for shifted windows).
    Returns (G, heads, P2, hd).
    """
    return _window_attention_fwd_impl(q, k, v, bias, mask, scale, win_blk,
                                      interpret)


def _probs(q, k, bias, mask, scale):
    sim = jnp.einsum("ghpc,ghqc->ghpq", q.astype(jnp.float32),
                     k.astype(jnp.float32)) * scale
    sim = sim + bias.astype(jnp.float32)[None] + mask.astype(jnp.float32)[:, None]
    return jax.nn.softmax(sim, axis=-1)


def _wa_fwd(q, k, v, bias, mask, scale, win_blk, interpret):
    out = _window_attention_fwd_impl(q, k, v, bias, mask, scale, win_blk,
                                     interpret)
    return out, (q, k, v, bias, mask)


def _wa_bwd(scale, win_blk, interpret, res, g):
    # Standard attention backward; probabilities recomputed (flash-style
    # rematerialization). Plain XLA for now — the forward is the hot path.
    q, k, v, bias, mask = res
    p = _probs(q, k, bias, mask, scale)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("ghpq,ghpc->ghqc", p, g32)
    dp = jnp.einsum("ghpc,ghqc->ghpq", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = scale * jnp.einsum("ghpq,ghqc->ghpc", ds, k.astype(jnp.float32))
    dk = scale * jnp.einsum("ghpq,ghpc->ghqc", ds, q.astype(jnp.float32))
    dbias = jnp.sum(ds, axis=0)
    dmask = jnp.sum(ds, axis=1)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dmask.astype(mask.dtype))


window_attention.defvjp(_wa_fwd, _wa_bwd)


def _window_attention_fwd_impl(q, k, v, bias, mask, scale, win_blk, interpret):
    g, heads, p2, hd = q.shape
    blk = min(win_blk, g)
    while g % blk:
        blk -= 1
    grid = (g // blk,)

    qkv_spec = pl.BlockSpec((blk, heads, p2, hd), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((heads, p2, p2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, p2, p2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias, mask)
