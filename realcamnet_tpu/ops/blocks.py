"""Core conv/attention-free building blocks (reference: `models/networks.py`).

Everything is NHWC flax.linen. The mode-string DSL mirrors the reference's
`networks.conv` factory (`networks.py:146-221`) so model assemblies can be
audited line-by-line against the reference, but each layer here is an
idiomatic XLA op (explicit torch-style padding so spatial shapes match the
reference exactly, including stride-2 cases where XLA 'SAME' places padding
differently than torch).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


class PReLU(nn.Module):
    """Parametric ReLU with a single learned slope (torch nn.PReLU default)."""

    init_slope: float = 0.25
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.param("slope", lambda k: jnp.full((1,), self.init_slope, self.param_dtype))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class InstanceNorm(nn.Module):
    """InstanceNorm2d over NHWC spatial dims (torch semantics, eps=1e-5)."""

    affine: bool = True
    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + jnp.asarray(self.epsilon, x.dtype))
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        return y


def avg_pool(x, window=2, stride=None, padding=0, count_include_pad=True):
    """torch-style AvgPool2d on NHWC (flax pooling: reverse-mode safe)."""
    window = _pair(window)
    stride = _pair(stride if stride is not None else window)
    padding = _pair(padding)
    pads = ((padding[0], padding[0]), (padding[1], padding[1]))
    return nn.avg_pool(x, window, stride, pads,
                       count_include_pad=count_include_pad)


def max_pool(x, window=2, stride=None, padding=0):
    window = _pair(window)
    stride = _pair(stride if stride is not None else window)
    padding = _pair(padding)
    pads = ((padding[0], padding[0]), (padding[1], padding[1]))
    return nn.max_pool(x, window, stride, pads)


def upsample_nearest(x, factor=2):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def resize_nearest(x, size):
    """Nearest-neighbor resize (torch F.interpolate mode='nearest') on NHWC."""
    b, h, w, c = x.shape
    nh, nw = size
    ys = jnp.clip((jnp.arange(nh) * (h / nh)).astype(jnp.int32), 0, h - 1)
    xs = jnp.clip((jnp.arange(nw) * (w / nw)).astype(jnp.int32), 0, w - 1)
    return x[:, ys][:, :, xs]


def upsample_bilinear(x, factor=2, align_corners=True):
    """torch nn.Upsample(mode='bilinear') on NHWC."""
    b, h, w, c = x.shape
    nh, nw = h * factor, w * factor
    return resize_bilinear(x, (nh, nw), align_corners=align_corners)


def resize_bilinear(x, size, align_corners=True):
    """Bilinear resize matching torch F.interpolate semantics on NHWC."""
    b, h, w, c = x.shape
    nh, nw = size
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if align_corners:
        ys = jnp.linspace(0.0, h - 1.0, nh)
        xs = jnp.linspace(0.0, w - 1.0, nw)
    else:
        ys = (jnp.arange(nh) + 0.5) * (h / nh) - 0.5
        xs = (jnp.arange(nw) + 0.5) * (w / nw) - 0.5
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(jnp.float32)[None, :, None, None]
    wx = (xs - x0).astype(jnp.float32)[None, None, :, None]
    top = xf[:, y0][:, :, x0] * (1 - wx) + xf[:, y0][:, :, x1] * wx
    bot = xf[:, y1][:, :, x0] * (1 - wx) + xf[:, y1][:, :, x1] * wx
    out = top * (1 - wy) + bot * wy
    return out.astype(dtype)


def upsample_bilinear_bhcw(x, factor: int = 2, align_corners: bool = True):
    """`upsample_bilinear` on channel-sublane (B, H, C, W) activations —
    interpolates H (axis 1) and W (axis 3); keeps sub-128-channel maps out
    of XLA's padded NHWC layout."""
    b, h, c, w = x.shape
    nh, nw = h * factor, w * factor
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if align_corners:
        ys = jnp.linspace(0.0, h - 1.0, nh)
        xs = jnp.linspace(0.0, w - 1.0, nw)
    else:
        ys = jnp.clip((jnp.arange(nh) + 0.5) / factor - 0.5, 0.0, h - 1.0)
        xs = jnp.clip((jnp.arange(nw) + 0.5) / factor - 0.5, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(jnp.float32)[None, :, None, None]
    wx = (xs - x0).astype(jnp.float32)[None, None, None, :]
    rows = xf[:, y0] * (1 - wy) + xf[:, y1] * wy          # (B, nh, C, W)
    out = rows[..., x0] * (1 - wx) + rows[..., x1] * wx   # (B, nh, C, nw)
    return out.astype(dtype)


class Conv2d(nn.Module):
    """NHWC conv with torch-style explicit padding and kaiming-uniform-ish init.

    Matches torch nn.Conv2d shape semantics: out = floor((H + 2p - d(k-1) - 1)/s) + 1.
    """

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 1
    dilation: Any = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    bias_init: Callable = nn.initializers.zeros
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, layout: str = "nhwc"):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        d = _pair(self.dilation)
        bhcw = layout == "bhcw"
        fast = (bhcw and not self.is_initializing() and k == (3, 3)
                and s == (1, 1) and p == (1, 1) and d == (1, 1)
                and self.groups == 1 and self.use_bias)
        if fast:
            # Channel-sublane Pallas conv (ops/pallas_conv.py): x is
            # (B,H,C,W); avoids XLA's 128-lane padding for C < 128.
            from realcamnet_tpu.ops.pallas_conv import conv3x3_bhcw_plain

            pp = self.variables["params"]["conv"]
            return conv3x3_bhcw_plain(x, pp["kernel"], pp["bias"])
        if bhcw:
            x = jnp.transpose(x, (0, 1, 3, 2))
        y = nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=((p[0], p[0]), (p[1], p[1])),
            kernel_dilation=d,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            param_dtype=self.param_dtype,
            dtype=x.dtype,
            name="conv",
        )(x)
        return jnp.transpose(y, (0, 1, 3, 2)) if bhcw else y


class ConvTranspose2d(nn.Module):
    """NHWC transposed conv matching torch shape semantics.

    out = (H-1)*s - 2p + d*(k-1) + output_padding + 1.
    """

    features: int
    kernel_size: Any = 2
    stride: Any = 2
    padding: Any = 0
    output_padding: Any = 0
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        op = _pair(self.output_padding)
        # lax.conv_transpose VALID output = (H-1)*s + k; torch crops p from both
        # sides and appends output_padding at the end.
        pad = tuple(
            (ki - 1 - pi, ki - 1 - pi + opi)
            for ki, pi, opi in zip(k, p, op)
        )
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=pad,
            use_bias=self.use_bias,
            param_dtype=self.param_dtype,
            dtype=x.dtype,
            name="conv",
        )(x)


class ConvBlock(nn.Module):
    """Mode-string conv factory (reference `networks.py:146-221`).

    'C' conv | 'X' depthwise | 'T' transpose | 'B' batchnorm | 'I'/'i'
    instancenorm(affine/not) | 'R'/'r' relu | 'L'/'l' leaky-relu(0.1) | 'P'
    prelu | 'S' sigmoid | '2'/'3'/'4' pixel-shuffle | 'U'/'u' nearest
    upsample x2/x3 | 'M'/'A' max/avg pool.
    """

    out_channels: int = 64
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    mode: str = "CBR"
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from realcamnet_tpu.ops.pixel import pixel_shuffle

        for idx, t in enumerate(self.mode):
            if t == "C":
                x = Conv2d(self.out_channels, self.kernel_size, self.stride,
                           self.padding, self.dilation, self.groups, self.bias,
                           param_dtype=self.param_dtype, name=f"{idx}_conv")(x)
            elif t == "X":
                x = Conv2d(self.out_channels, self.kernel_size, self.stride,
                           self.padding, self.dilation, groups=self.out_channels,
                           use_bias=self.bias, param_dtype=self.param_dtype,
                           name=f"{idx}_dwconv")(x)
            elif t == "T":
                x = ConvTranspose2d(self.out_channels, self.kernel_size,
                                    self.stride, self.padding,
                                    use_bias=self.bias,
                                    param_dtype=self.param_dtype,
                                    name=f"{idx}_tconv")(x)
            elif t == "B":
                x = nn.BatchNorm(use_running_average=not train,
                                 param_dtype=self.param_dtype, dtype=x.dtype,
                                 name=f"{idx}_bn")(x)
            elif t == "I":
                x = InstanceNorm(affine=True, param_dtype=self.param_dtype,
                                 name=f"{idx}_in")(x)
            elif t == "i":
                x = InstanceNorm(affine=False, name=f"{idx}_in")(x)
            elif t in ("R", "r"):
                x = jax.nn.relu(x)
            elif t in ("L", "l"):
                x = leaky_relu(x, 0.1)
            elif t == "P":
                x = PReLU(param_dtype=self.param_dtype, name=f"{idx}_prelu")(x)
            elif t == "S":
                x = jax.nn.sigmoid(x)
            elif t in ("2", "3", "4"):
                x = pixel_shuffle(x, int(t))
            elif t == "U":
                x = upsample_nearest(x, 2)
            elif t == "u":
                x = upsample_nearest(x, 3)
            elif t == "M":
                x = max_pool(x, self.kernel_size, self.stride, 0)
            elif t == "A":
                x = avg_pool(x, self.kernel_size, self.stride, 0)
            else:
                raise NotImplementedError(f"Undefined mode char: {t}")
        return x


class CALayer(nn.Module):
    """Channel attention: GAP -> 1x1 down(r) -> ReLU -> 1x1 up -> sigmoid gate.

    Reference `networks.py:255-270`.
    """

    channels: int = 64
    reduction: int = 16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pool=None):
        """pool=(axis_name, band): distributed-exact GAP for spatial-sharded
        bands (parallel/spatial.py staged halo exchange) — average the
        CENTRAL `band` rows only (excludes halo rows, which duplicate
        neighbor content) and pmean over the mesh axis, which equals the
        full-frame mean for equal bands. pool=(None, band) crops without the
        collective (single-device tiling)."""
        if pool is None:
            y = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            axis_name, band = pool
            c0 = (x.shape[1] - band) // 2
            y = jnp.mean(x[:, c0:c0 + band], axis=(1, 2), keepdims=True)
            if axis_name is not None:
                y = jax.lax.pmean(y, axis_name)
        y = Conv2d(max(1, self.channels // self.reduction), 1, 1, 0,
                   param_dtype=self.param_dtype, name="down")(y)
        y = jax.nn.relu(y)
        y = Conv2d(self.channels, 1, 1, 0, param_dtype=self.param_dtype,
                   name="up")(y)
        return x * jax.nn.sigmoid(y)


class ResBlock(nn.Module):
    """x + conv(act(conv(x))) (reference `networks.py:276-290`)."""

    channels: int = 64
    kernel_size: int = 3
    mode: str = "CRC"
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mode = self.mode
        if mode[0] in ("R", "L"):
            mode = mode[0].lower() + mode[1:]
        res = ConvBlock(self.channels, self.kernel_size, mode=mode,
                        padding=self.kernel_size // 2,
                        param_dtype=self.param_dtype, name="res")(x)
        return x + res


class RCABlock(nn.Module):
    """Residual channel-attention block: x + CA(conv(act(conv(x)))).

    Reference `networks.py:296-311`.
    """

    channels: int = 64
    kernel_size: int = 3
    mode: str = "CRC"
    reduction: int = 16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pool=None):
        mode = self.mode
        if mode[0] in ("R", "L"):
            mode = mode[0].lower() + mode[1:]
        res = ConvBlock(self.channels, self.kernel_size, mode=mode,
                        padding=self.kernel_size // 2,
                        param_dtype=self.param_dtype, name="res")(x)
        res = CALayer(self.channels, self.reduction,
                      param_dtype=self.param_dtype, name="ca")(res, pool=pool)
        return res + x


class RCAGroup(nn.Module):
    """nb x RCABlock + trailing conv, outer residual — the ISP workhorse.

    Reference `networks.py:317-335`. With `fused=True` (or `"bhcw"`; default
    'CRC' mode / 3x3 kernels only) the forward runs the Pallas fused RCAB
    chain in the channel-sublane BHCW layout (ops/pallas_conv.py) — proven
    on real TPU hardware at ~2.8x the XLA NHWC path at 4K, where XLA
    lane-pads 48 channels to 128. Init and gradient paths are unchanged
    (custom_vjp recomputes through the XLA reference).
    """

    channels: int = 64
    kernel_size: int = 3
    mode: str = "CRC"
    reduction: int = 16
    nb: int = 12
    fused: Any = False  # False | True | "bhcw"
    fused_tile_h: int = 8
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, layout: str = "nhwc", pool=None):
        bhcw_in = layout == "bhcw"
        if (self.fused and pool is None and not self.is_initializing()
                and self.mode == "CRC" and self.kernel_size == 3):
            if self.fused == "pair":
                # Paired RCAB kernels (inference fast path): conv1+relu+
                # conv2 per kernel call, mid activation stays in VMEM.
                from realcamnet_tpu.ops.pallas_conv import fused_rcag_pair_bhcw

                xb = x if bhcw_in else jnp.transpose(x, (0, 1, 3, 2))
                out = fused_rcag_pair_bhcw(self.variables["params"], xb,
                                           self.nb)
                return out if bhcw_in else jnp.transpose(out, (0, 1, 3, 2))
            from realcamnet_tpu.ops.pallas_conv import fused_rcag_bhcw

            xb = x if bhcw_in else jnp.transpose(x, (0, 1, 3, 2))
            out = fused_rcag_bhcw(self.variables["params"], xb, self.nb)
            return out if bhcw_in else jnp.transpose(out, (0, 1, 3, 2))
        if bhcw_in:
            x = jnp.transpose(x, (0, 1, 3, 2))
        res = x
        for i in range(self.nb):
            res = RCABlock(self.channels, self.kernel_size, self.mode,
                           self.reduction, param_dtype=self.param_dtype,
                           name=f"rcab{i}")(res, pool=pool)
        res = Conv2d(self.channels, 3, 1, 1, param_dtype=self.param_dtype,
                     name="tail")(res)
        res = res + x
        return jnp.transpose(res, (0, 1, 3, 2)) if bhcw_in else res
