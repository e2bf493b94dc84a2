"""Compression-codec layer library (TPU-native equivalents of the CompressAI
layers the reference imports at `tcm.py:1-11` / `raw2bit.py:5-12`):
GDN/IGDN, ResidualBlock(+stride/upsample), AttentionBlock, subpel conv.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.ops.blocks import Conv2d, leaky_relu
from realcamnet_tpu.ops.bound import lower_bound
from realcamnet_tpu.ops.pixel import pixel_shuffle

Dtype = Any

_REPARAM_OFFSET = 2 ** -18
_PEDESTAL = _REPARAM_OFFSET ** 2


def _nonneg_init(value: jnp.ndarray) -> jnp.ndarray:
    """Store-value for a non-negative-reparametrized parameter."""
    return jnp.sqrt(jnp.maximum(value + _PEDESTAL, _PEDESTAL))


def _nonneg(stored: jnp.ndarray, minimum: float = 0.0) -> jnp.ndarray:
    bound = (minimum + _PEDESTAL) ** 0.5
    return lower_bound(stored, bound) ** 2 - _PEDESTAL


class GDN(nn.Module):
    """Generalized divisive normalization: y = x / sqrt(beta + gamma @ x^2)
    (inverse: multiply). Non-negative reparametrization + lower-bounded params
    match CompressAI's GDN (used inside ResidualBlockWithStride/Upsample)."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        beta = self.param("beta", lambda k: _nonneg_init(jnp.ones((c,), self.param_dtype)))
        gamma = self.param(
            "gamma",
            lambda k: _nonneg_init(self.gamma_init * jnp.eye(c, dtype=self.param_dtype)),
        )
        beta_v = _nonneg(beta, self.beta_min).astype(jnp.float32)
        gamma_v = _nonneg(gamma).astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        norm = jnp.einsum("bhwc,cd->bhwd", x32 * x32, gamma_v) + beta_v
        norm = jnp.sqrt(norm)
        out = x32 * norm if self.inverse else x32 / norm
        return out.astype(x.dtype)


class ResidualBlock(nn.Module):
    """conv3x3 -> lrelu -> conv3x3 -> lrelu, + (1x1-projected) identity.

    CompressAI `ResidualBlock` (imported at `tcm.py:5`)."""

    out_c: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        h = Conv2d(self.out_c, 3, 1, 1, param_dtype=self.param_dtype, name="conv1")(x)
        h = leaky_relu(h, 0.01)
        h = Conv2d(self.out_c, 3, 1, 1, param_dtype=self.param_dtype, name="conv2")(h)
        h = leaky_relu(h, 0.01)
        if x.shape[-1] != self.out_c:
            identity = Conv2d(self.out_c, 1, 1, 0, param_dtype=self.param_dtype,
                              name="skip")(x)
        return h + identity


class ResidualBlockWithStride(nn.Module):
    """conv3x3/s -> lrelu -> conv3x3 -> GDN, + strided 1x1 skip.

    CompressAI `ResidualBlockWithStride` (imported at `tcm.py:8`)."""

    out_c: int
    stride: int = 2
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.out_c, 3, self.stride, 1, param_dtype=self.param_dtype,
                   name="conv1")(x)
        h = leaky_relu(h, 0.01)
        h = Conv2d(self.out_c, 3, 1, 1, param_dtype=self.param_dtype, name="conv2")(h)
        h = GDN(self.out_c, param_dtype=self.param_dtype, name="gdn")(h)
        if self.stride != 1 or x.shape[-1] != self.out_c:
            identity = Conv2d(self.out_c, 1, self.stride, 0,
                              param_dtype=self.param_dtype, name="skip")(x)
        else:
            identity = x
        return h + identity


class SubpelConv3x3(nn.Module):
    """conv3x3(in -> out*r^2) + PixelShuffle(r) (CompressAI `subpel_conv3x3`)."""

    out_c: int
    r: int = 2
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.out_c * self.r * self.r, 3, 1, 1,
                   param_dtype=self.param_dtype, name="conv")(x)
        return pixel_shuffle(h, self.r)


class ResidualBlockUpsample(nn.Module):
    """subpel conv x2 -> lrelu -> conv3x3 -> IGDN, + subpel-conv skip.

    CompressAI `ResidualBlockUpsample` (imported at `tcm.py:7`)."""

    out_c: int
    upsample: int = 2
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = SubpelConv3x3(self.out_c, self.upsample, self.param_dtype, name="subpel")(x)
        h = leaky_relu(h, 0.01)
        h = Conv2d(self.out_c, 3, 1, 1, param_dtype=self.param_dtype, name="conv")(h)
        h = GDN(self.out_c, inverse=True, param_dtype=self.param_dtype, name="igdn")(h)
        identity = SubpelConv3x3(self.out_c, self.upsample, self.param_dtype,
                                 name="upsample")(x)
        return h + identity


class ResidualUnit(nn.Module):
    """1x1(N->N/2) relu 3x3 relu 1x1(->N), residual, relu (CompressAI
    AttentionBlock inner unit)."""

    n: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.n // 2, 1, 1, 0, param_dtype=self.param_dtype, name="c0")(x)
        h = jax.nn.relu(h)
        h = Conv2d(self.n // 2, 3, 1, 1, param_dtype=self.param_dtype, name="c1")(h)
        h = jax.nn.relu(h)
        h = Conv2d(self.n, 1, 1, 0, param_dtype=self.param_dtype, name="c2")(h)
        return jax.nn.relu(h + x)


class AttentionBlock(nn.Module):
    """Cheng2020 attention: out = conv_a(x) * sigmoid(conv_b(x)) + x.

    CompressAI `AttentionBlock` (imported at `tcm.py:4`); the SWAtten variant
    (`tcm.py:270-291`) swaps the conv_b input for a Swin-processed branch —
    see realcamnet_tpu/models/tcm.py."""

    n: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = x
        for i in range(3):
            a = ResidualUnit(self.n, self.param_dtype, name=f"a{i}")(a)
        b = x
        for i in range(3):
            b = ResidualUnit(self.n, self.param_dtype, name=f"b{i}")(b)
        b = Conv2d(self.n, 1, 1, 0, param_dtype=self.param_dtype, name="b3")(b)
        return a * jax.nn.sigmoid(b) + x


class MaskedConv2d(nn.Module):
    """Autoregressive masked conv (CompressAI `MaskedConv2d`, imported by the
    reference at `raw2bit.py:11` though unused by any constructed model).

    mask_type 'A' zeroes the center tap and everything after it in raster
    order (first layer of a PixelCNN-style context model); 'B' keeps the
    center. The mask is a trace-time constant multiplied into the kernel —
    static under jit, no data-dependent control flow.
    """

    features: int
    kernel_size: int = 5
    mask_type: str = "A"
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        import numpy as np

        mask = np.ones((k, k, 1, 1), np.float32)
        c = k // 2
        mask[c, c + (1 if self.mask_type == "B" else 0):] = 0.0
        mask[c + 1:] = 0.0
        y = jax.lax.conv_general_dilated(
            x.astype(self.param_dtype), kernel * jnp.asarray(mask),
            (1, 1), ((c, c), (c, c)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (y + bias).astype(x.dtype)


class Deconv(nn.Module):
    """Stride-2 transposed conv (CompressAI `deconv` helper, `raw2bit.py:12`):
    upsamples H,W by `stride` with output_padding = stride - 1 semantics."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        pad = k // 2
        y = nn.ConvTranspose(
            self.features, (k, k), strides=(s, s),
            padding=((k - 1 - pad, k - 1 - pad + s - 1),
                     (k - 1 - pad, k - 1 - pad + s - 1)),
            param_dtype=self.param_dtype, dtype=x.dtype, name="deconv")(x)
        return y
