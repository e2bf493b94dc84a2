"""GroupMix (GMA) linear attention, TPU-native (reference `models/groupmix.py`).

EfficientAtt is O(N) in tokens: softmax(K)^T V then Q (K^T V) — two batched
matmuls that land on the MXU — plus a convolutional relative position
encoding and a multi-scale "group proxy" aggregator. All feature maps NHWC;
tokens never leave the (B, H, W, C) layout (reshapes are metadata-only).

SyncBatchNorm in the reference (`groupmix.py:64-77`) becomes flax BatchNorm:
under pjit with a batch sharded over the mesh 'data' axis, XLA computes the
global batch statistics with collectives automatically (the psum analog of
NCCL SyncBN — SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.ops.blocks import Conv2d

Dtype = Any


class SeparableConv(nn.Module):
    """Depthwise + pointwise conv, no bias (`groupmix.py:240-249`)."""

    out_c: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = Conv2d(c, self.kernel_size, self.stride, self.padding, groups=c,
                   use_bias=False, param_dtype=self.param_dtype, name="dw")(x)
        return Conv2d(self.out_c, 1, 1, 0, use_bias=False,
                      param_dtype=self.param_dtype, name="pw")(h)


class BatchNormAct(nn.Module):
    """BatchNorm (+ optional hardswish), cross-replica under pjit."""

    use_act: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, param_dtype=self.param_dtype,
                         dtype=x.dtype, name="bn")(x)
        return jax.nn.hard_swish(x) if self.use_act else x


class ConvRelPosEnc(nn.Module):
    """Convolutional relative position encoding (`groupmix.py:108-156`):
    per-head-group depthwise convs on V; output q * conv(v).

    q, v: (B, heads, H*W, Ch) with window dict {3: 2, 5: 3, 7: 3}.
    """

    ch: int
    heads: int
    window: Tuple[Tuple[int, int], ...] = ((3, 2), (5, 3), (7, 3))
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, v, size):
        h, w = size
        b, nh, n, ch = q.shape
        # (B, heads, N, Ch) -> (B, H, W, heads*Ch)
        v_img = v.transpose(0, 2, 1, 3).reshape(b, h, w, nh * ch)
        window = self.window
        if sum(hs for _, hs in window) != nh:
            # Reference hardcodes the 8-head split {3:2,5:3,7:3}
            # (`groupmix.py:177`); other head counts use one 3x3 window.
            window = ((3, nh),)
        outs = []
        start = 0
        for win, head_split in window:
            c = head_split * ch
            part = v_img[..., start : start + c]
            conv = Conv2d(c, win, 1, win // 2, groups=c,
                          param_dtype=self.param_dtype, name=f"conv{win}")(part)
            outs.append(conv)
            start += c
        conv_v = jnp.concatenate(outs, axis=-1)
        conv_v = conv_v.reshape(b, n, nh, ch).transpose(0, 2, 1, 3)
        return q * conv_v


class Aggregator(nn.Module):
    """GroupMix aggregator (`groupmix.py:56-105`): splits the stacked q/k/v
    channels into 5 segments — seg0 identity, seg1/2/3 multi-scale separable
    convs (k=3/5/7), seg4 processed jointly across Q,K,V — each BN+hardswish.

    Input qkv: (3, B, H, W, seg_dim*5). Returns ((3, B, heads, N, c),
    x_local (B, H, W, seg_dim))."""

    dim: int
    seg: int = 5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qkv, num_heads: int, train: bool = False):
        three, b, h, w, c = qkv.shape
        seg_dim = self.dim // self.seg
        pd = self.param_dtype

        parts = jnp.split(qkv, self.seg, axis=-1)

        # Joint QKV segment: concat the three stacks channel-wise.
        x_local = parts[4].transpose(1, 2, 3, 0, 4).reshape(b, h, w, 3 * seg_dim)
        x_local = SeparableConv(seg_dim, 3, 1, 1, pd, name="agg0_conv")(x_local)
        x_local = nn.LayerNorm(epsilon=1e-5, param_dtype=pd, dtype=x_local.dtype,
                               name="agg0_norm")(x_local)
        x_local = jax.nn.hard_swish(x_local)

        flat = lambda p: p.reshape(three * b, h, w, seg_dim)
        x0 = BatchNormAct(param_dtype=pd, name="norm0")(flat(parts[0]), train=train)
        x1 = SeparableConv(seg_dim, 3, 1, 1, pd, name="agg1")(flat(parts[1]))
        x1 = BatchNormAct(param_dtype=pd, name="norm1")(x1, train=train)
        x2 = SeparableConv(seg_dim, 5, 1, 2, pd, name="agg2")(flat(parts[2]))
        x2 = BatchNormAct(param_dtype=pd, name="norm2")(x2, train=train)
        x3 = SeparableConv(seg_dim, 7, 1, 3, pd, name="agg3")(flat(parts[3]))
        x3 = BatchNormAct(param_dtype=pd, name="norm3")(x3, train=train)

        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)  # (3B, H, W, 4*seg_dim)
        cc = 4 * seg_dim
        x = x.reshape(three, b, h * w, num_heads, cc // num_heads)
        x = x.transpose(0, 1, 3, 2, 4)  # (3, B, heads, N, c)
        return x, x_local


class EfficientAtt(nn.Module):
    """GMA linear attention (`groupmix.py:159-200`):
    eff = Q (softmax(K)^T V) * scale + CRPE(Q, V); concat joint-segment
    tokens; output projection. Input/output (B, H, W, C)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        pd = self.param_dtype
        n = h * w
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, param_dtype=pd,
                       dtype=x.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h, w, 3, c).transpose(3, 0, 1, 2, 4)  # (3,B,H,W,C)

        agg, x_local = Aggregator(self.dim, 5, pd, name="aggregator")(
            qkv, self.num_heads, train=train)
        q, k, v = agg[0], agg[1], agg[2]  # (B, heads, N, ch)

        k_soft = jax.nn.softmax(k.astype(jnp.float32), axis=2).astype(v.dtype)
        ktv = jnp.einsum("bhnk,bhnv->bhkv", k_soft, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        eff = jnp.einsum("bhnk,bhkv->bhnv", q, ktv,
                         preferred_element_type=jnp.float32).astype(v.dtype)

        trans_dim = self.dim // 5 * 4
        ch = trans_dim // self.num_heads
        crpe = ConvRelPosEnc(ch, self.num_heads, param_dtype=pd,
                             name="crpe")(q, v, (h, w))

        scale = (self.dim // self.num_heads) ** -0.5
        out = scale * eff + crpe  # (B, heads, N, ch)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, trans_dim)
        out = jnp.concatenate([out, x_local], axis=-1)
        return nn.Dense(self.dim, param_dtype=pd, dtype=x.dtype, name="proj")(out)


class ConvPosEnc(nn.Module):
    """Depthwise-conv positional encoding: x + dwconv(x)
    (`groupmix.py:203-217`)."""

    k: int = 3
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return x + Conv2d(c, self.k, 1, self.k // 2, groups=c,
                          param_dtype=self.param_dtype, name="proj")(x)


class GMABlock(nn.Module):
    """CPE -> LN -> EfficientAtt -> residual; LN -> MLP -> residual
    (`groupmix.py:274-299`)."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    # torch nn.LayerNorm default; the GroupMixFormer backbone overrides with
    # 1e-6 (`groupmix.py:345`, partial(nn.LayerNorm, eps=1e-6)).
    ln_eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from realcamnet_tpu.ops.attention.wmsa import drop_path

        pd = self.param_dtype

        def dp(y):
            if self.drop_path_rate > 0.0 and train:
                return drop_path(y, self.drop_path_rate, False,
                                 self.make_rng("dropout"))
            return y

        x = ConvPosEnc(3, pd, name="cpe")(x)
        cur = nn.LayerNorm(epsilon=self.ln_eps, param_dtype=pd, dtype=x.dtype, name="norm1")(x)
        cur = EfficientAtt(self.dim, self.num_heads, param_dtype=pd,
                           name="att")(cur, train=train)
        x = x + dp(cur)
        cur = nn.LayerNorm(epsilon=self.ln_eps, param_dtype=pd, dtype=x.dtype, name="norm2")(x)
        cur = nn.Dense(int(self.dim * self.mlp_ratio), param_dtype=pd,
                       dtype=x.dtype, name="mlp0")(cur)
        cur = jax.nn.gelu(cur, approximate=False)
        cur = nn.Dense(self.dim, param_dtype=pd, dtype=x.dtype, name="mlp1")(cur)
        return x + dp(cur)
