"""Swin window multi-head self-attention, TPU-native.

Reference: `models/tcm.py:139-236` (WMSA + Block) and `tcm.py:293-312`
(SwinBlock W+SW pair). Semantics preserved: 8x8 (or 4x4) windows, learned
relative-position bias table of (2w-1)^2 entries per head, cyclic shift +
boolean masking for the 'SW' type. TPU-first details:

- NHWC layout; windows flattened into the batch dimension so the per-window
  (p^2 x p^2) attention matmuls batch onto the MXU.
- The SW attention mask depends only on the *static* padded (H, W), so it is
  built with numpy at trace time and constant-folded — no data-dependent
  control flow under jit (the reference builds it per forward on device,
  `tcm.py:160-177`).
- Inputs whose H/W are not window multiples are zero-padded and cropped back
  (the reference's pad branch is buggy dead code, SURVEY.md §0.1 — it returns
  enlarged outputs; we pad/unpad correctly). Padded rows attend within their
  own window only; the result on real pixels matches the reference whenever
  the reference is well-defined (window-multiple inputs).
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# Trace-time default for the Pallas window-attention kernel. Every WMSA in
# every model (TCM, raw2bit ChARM heads, SWAtten) defers to this unless its
# `use_pallas` field is set explicitly, so one switch moves the whole Swin
# stack onto the fused kernel without touching checkpoints or constructors.
# Values: False | True (r3 kernel, pallas_wmsa.py) | "v2" (r4 fused
# heads-in-sublanes kernel, pallas_wmsa2.py). Env: RCN_PALLAS_WMSA=0/1/2.
_PALLAS_WMSA = [{"0": False, "1": True, "2": "v2"}.get(
    os.environ.get("RCN_PALLAS_WMSA", "0"), False)]

# Profitability gate for the v2 kernel: minimum padded window count. The
# chip-measured break-even (artifacts/wmsa2_chip_check_r04.json +
# wmsa_gate_probe_r05.json) sets the default; env RCN_WMSA_GATE overrides.
_WMSA_GATE = [int(os.environ.get("RCN_WMSA_GATE", "1024"))]


def set_wmsa_gate(min_windows: int) -> int:
    """Set the v2-kernel window-count gate; returns the previous value.
    Trace-time, like set_wmsa_pallas."""
    prev = _WMSA_GATE[0]
    _WMSA_GATE[0] = int(min_windows)
    return prev


def set_wmsa_pallas(enabled) -> bool:
    """Set the process-wide Pallas-WMSA default (False | True | 'v2' |
    'v2-force'); returns the previous value. Takes effect at trace time —
    re-jit (new shapes or cleared caches) after flipping. 'v2-force'
    bypasses the >=1024-window profitability gate (measurement tool use:
    tools/chip_wmsa_gate_probe.py)."""
    prev = _PALLAS_WMSA[0]
    _PALLAS_WMSA[0] = (enabled if enabled in (False, True, "v2", "v2-force")
                       else bool(enabled))
    return prev


@contextlib.contextmanager
def wmsa_pallas(enabled: bool = True):
    prev = set_wmsa_pallas(enabled)
    try:
        yield
    finally:
        set_wmsa_pallas(prev)


@functools.lru_cache(maxsize=64)
def _relative_index(window: int) -> np.ndarray:
    """(p^2, p^2, 2) int index into the (2w-1, 2w-1) bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"), -1).reshape(-1, 2)
    rel = coords[:, None, :] - coords[None, :, :] + window - 1
    return rel


@functools.lru_cache(maxsize=64)
def _shift_patterns(window: int, shift: int):
    """The two (p^2, p^2) seam patterns (bool): row-seam (applies to the last
    window row) and col-seam (last window column). Matches
    `WMSA.generate_mask` (`tcm.py:160-177`): after rolling by -shift, the
    last window row/col contain wrapped content that must not attend across
    the wrap seam."""
    p = window
    s = p - shift
    row = np.zeros((p, p, p, p), dtype=bool)
    row[:s, :, s:, :] = True
    row[s:, :, :s, :] = True
    col = np.zeros((p, p, p, p), dtype=bool)
    col[:, :s, :, s:] = True
    col[:, s:, :, :s] = True
    return (row.reshape(p * p, p * p), col.reshape(p * p, p * p))


def _shift_mask(h_windows: int, w_windows: int, window: int, shift: int,
                neg: float = -1e9) -> jnp.ndarray:
    """Additive attention mask (nW, p^2, p^2): 0 allowed, `neg` masked.

    Only the two (p^2, p^2) seam patterns are trace-time constants; the
    (nW, p^2, p^2) mask is assembled on device from per-window row/col
    flags. Embedding the full mask as an executable constant is both
    wasteful (nW scales with image area) and catastrophically slow through
    remote-dispatch backends that re-ship constants per call (measured 22 ms
    vs 0.08 ms per SW-attention layer at 256x256x64 on one v5e chip)."""
    row_pat, col_pat = _shift_patterns(window, shift)
    row_pat = jnp.asarray(row_pat.astype(np.float32) * neg)
    col_pat = jnp.asarray(col_pat.astype(np.float32) * neg)
    is_last_row = jnp.zeros((h_windows,), jnp.float32).at[-1].set(1.0)
    is_last_col = jnp.zeros((w_windows,), jnp.float32).at[-1].set(1.0)
    flags_r = jnp.repeat(is_last_row, w_windows)  # (nW,)
    flags_c = jnp.tile(is_last_col, h_windows)
    mask = (flags_r[:, None, None] * row_pat[None]
            + flags_c[:, None, None] * col_pat[None])
    # Corner window gets row+col sums (-2e9): same effect under softmax.
    return mask


class WMSA(nn.Module):
    """Window MSA (reference `tcm.py:139-212`). Input/output (B, H, W, C)."""

    dim: int
    head_dim: int
    window_size: int
    shifted: bool = False
    param_dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None  # None -> module default (set_wmsa_pallas)

    @nn.compact
    def __call__(self, x):
        use_pallas = (_PALLAS_WMSA[0] if self.use_pallas is None
                      else self.use_pallas)
        b, h, w, c = x.shape
        p = self.window_size
        n_heads = self.dim // self.head_dim
        shift = p // 2 if self.shifted else 0

        pad_h = (p - h % p) % p
        pad_w = (p - w % p) % p
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

        hw, ww = hp // p, wp // p
        # (B, hw, p, ww, p, C) -> (B, hw*ww, p*p, C)
        xw = x.reshape(b, hw, p, ww, p, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b, hw * ww, p * p, c)

        if (use_pallas in ("v2", "v2-force") and not self.is_initializing()
                and p * p >= 64
                and (use_pallas == "v2-force"
                     or (hp // p) * (wp // p) >= _WMSA_GATE[0])):
            # Gate by window count: measured on chip the fused kernel wins
            # 2.2x at 8160 windows and 1.35x at 2040, but loses (0.8x) at
            # <= 510 windows where grid overhead dominates
            # (artifacts/wmsa2_chip_check_r04.json) — small maps (stage 3,
            # hyper, ChARM heads) stay on XLA.
            # r4 fused kernel (pallas_wmsa2.py): qkv + attention + proj in
            # one pass, heads stacked in sublanes — no materialized tensor
            # has a small trailing dim, scores never leave VMEM. Params are
            # identical to the default path (init traces it below).
            from realcamnet_tpu.ops.attention.pallas_wmsa2 import wmsa_fused

            nw = hw * ww
            n_heads_ = self.dim // self.head_dim
            scale = self.head_dim ** -0.5
            table = self.param(
                "rel_pos_bias",
                nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
                (2 * p - 1, 2 * p - 1, n_heads_), self.param_dtype,
            )
            idx = _relative_index(p)
            bias = table[idx[..., 0], idx[..., 1]]      # (p2, p2, heads)
            # [h*p2 + key, query] layout = per-head transpose.
            bias_kq = jnp.transpose(bias, (2, 1, 0)).reshape(
                n_heads_ * p * p, p * p).astype(jnp.float32)
            if shift:
                row_pat, col_pat = _shift_patterns(p, shift)
                neg = jnp.float32(-1e9)
                # Seam patterns are symmetric in (query, key), so the
                # key-major layout reuses them untransposed.
                row_kq = jnp.tile(jnp.asarray(row_pat, jnp.float32),
                                  (n_heads_, 1)) * neg
                col_kq = jnp.tile(jnp.asarray(col_pat, jnp.float32),
                                  (n_heads_, 1)) * neg
                fr = jnp.zeros((hw,), jnp.float32).at[-1].set(1.0)
                fc = jnp.zeros((ww,), jnp.float32).at[-1].set(1.0)
                flags = jnp.stack([jnp.repeat(fr, ww), jnp.tile(fc, hw)], -1)
                seam = (row_kq, col_kq, jnp.tile(flags, (b, 1)))
            else:
                seam = None
            v = self.variables["params"]
            out = wmsa_fused(
                xw.reshape(b * nw, p * p, c),
                v["qkv"]["kernel"], v["qkv"]["bias"],
                v["proj"]["kernel"], v["proj"]["bias"],
                bias_kq, scale, n_heads_, seam=seam,
                interpret=jax.default_backend() == "cpu")
            out = out.reshape(b, hw, ww, p, p, c).transpose(0, 1, 3, 2, 4, 5)
            out = out.reshape(b, hp, wp, c)
            if shift:
                out = jnp.roll(out, (shift, shift), axis=(1, 2))
            if pad_h or pad_w:
                out = out[:, :h, :w, :]
            return out

        qkv = nn.Dense(3 * self.dim, param_dtype=self.param_dtype,
                       dtype=x.dtype, name="qkv")(xw)
        qkv = qkv.reshape(b, hw * ww, p * p, 3, n_heads, self.head_dim)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        # (B, nW, heads, p^2, hd)
        q = q.transpose(0, 1, 3, 2, 4)
        k = k.transpose(0, 1, 3, 2, 4)
        v = v.transpose(0, 1, 3, 2, 4)

        scale = self.head_dim ** -0.5
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
            (2 * p - 1, 2 * p - 1, n_heads), self.param_dtype,
        )
        idx = _relative_index(p)
        bias = table[idx[..., 0], idx[..., 1]]  # (p^2, p^2, heads)
        bias_hpq = bias.transpose(2, 0, 1)

        if use_pallas:
            from realcamnet_tpu.ops.attention.pallas_wmsa import window_attention

            nw = hw * ww
            if shift:
                # Seam-compressed mask: the two (p^2, p^2) patterns are
                # trace-time constants; per-window (G, 2) flags say whether a
                # window sits on the last window row / column. The kernel
                # rebuilds the mask in VMEM — no O(G * p^4) HBM traffic.
                row_pat, col_pat = _shift_patterns(p, shift)
                neg = jnp.float32(-1e9)
                row_pat = jnp.asarray(row_pat, jnp.float32) * neg
                col_pat = jnp.asarray(col_pat, jnp.float32) * neg
                fr = jnp.zeros((hw,), jnp.float32).at[-1].set(1.0)
                fc = jnp.zeros((ww,), jnp.float32).at[-1].set(1.0)
                flags = jnp.stack([jnp.repeat(fr, ww), jnp.tile(fc, hw)], -1)
                seam = (row_pat, col_pat, jnp.tile(flags, (b, 1)))
            else:
                seam = None
            out = window_attention(
                q.reshape(b * nw, n_heads, p * p, self.head_dim),
                k.reshape(b * nw, n_heads, p * p, self.head_dim),
                v.reshape(b * nw, n_heads, p * p, self.head_dim),
                bias_hpq.astype(jnp.float32), scale, 8,
                jax.default_backend() == "cpu", seam=seam,
            )
            out = out.reshape(b, nw, n_heads, p * p, self.head_dim)
        else:
            sim = jnp.einsum("bwhpc,bwhqc->bwhpq", q, k,
                             preferred_element_type=jnp.float32) * scale
            sim = sim + bias_hpq[None, None].astype(sim.dtype)
            if shift:
                mask = _shift_mask(hw, ww, p, shift)
                sim = sim + mask[None, :, None, :, :]
            probs = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
            out = jnp.einsum("bwhpq,bwhqc->bwhpc", probs, v,
                             preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, hw * ww, p * p, self.dim)
        out = nn.Dense(self.dim, param_dtype=self.param_dtype, dtype=x.dtype,
                       name="proj")(out)

        out = out.reshape(b, hw, ww, p, p, self.dim).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, self.dim)
        if shift:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            out = out[:, :h, :w, :]
        return out


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Per-sample stochastic depth (timm DropPath semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class SwinTransformerBlock(nn.Module):
    """LN -> WMSA -> residual(+DropPath); LN -> MLP(4x, GELU) -> residual.

    Reference `Block`, `tcm.py:214-236`. Operates on (B, H, W, C).
    """

    dim: int
    head_dim: int
    window_size: int
    shifted: bool = False
    drop_path_rate: float = 0.0
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def dp(y):
            if self.drop_path_rate > 0.0 and train:
                return drop_path(y, self.drop_path_rate, False,
                                 self.make_rng("dropout"))
            return y

        h = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, dtype=x.dtype, name="ln1")(x)
        x = x + dp(WMSA(self.dim, self.head_dim, self.window_size,
                        self.shifted, self.param_dtype, name="msa")(h))
        h = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, dtype=x.dtype, name="ln2")(x)
        h = nn.Dense(4 * self.dim, param_dtype=self.param_dtype, dtype=x.dtype,
                     name="mlp0")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, param_dtype=self.param_dtype, dtype=x.dtype,
                     name="mlp1")(h)
        return x + dp(h)


class SwinBlockPair(nn.Module):
    """W + SW SwinTransformerBlock pair (reference `SwinBlock`,
    `tcm.py:293-312`; its pad branch is fixed here per SURVEY.md §0.1)."""

    dim: int
    head_dim: int
    window_size: int
    drop_path_rate: float = 0.0
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SwinTransformerBlock(self.dim, self.head_dim, self.window_size,
                                 False, self.drop_path_rate, self.param_dtype,
                                 name="w")(x, train=train)
        return SwinTransformerBlock(self.dim, self.head_dim, self.window_size,
                                    True, self.drop_path_rate, self.param_dtype,
                                    name="sw")(x, train=train)
