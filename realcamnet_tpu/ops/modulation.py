"""Conditioning / modulation blocks: SFT, GFM (FiLM), LSC/CADR.

References: `LiteISP.py:293-321` (SFT/GFM layers), `LiteISP.py:326-343`
(ResBlock_with_modulation), `LiteISP.py:363-378` (Lens_Shading_Correction —
the CADR core), `LiteISP.py:537-559` (Res_GFM workhorse),
`LiteISP.py:562-620` (SpatialFeatureTransform, Res_GFM_LFM).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.ops.blocks import Conv2d, leaky_relu

Dtype = Any

# Residual-branch convs in the reference are kaiming-init then scaled by 0.1
# (`LiteISP.py:233-250`); variance_scaling with 0.01 gain matches that scale.
scaled_kaiming = nn.initializers.variance_scaling(2.0 * 0.01, "fan_in", "normal")


class Dense(nn.Module):
    """Thin nn.Dense wrapper keeping param dtype f32 and compute dtype of x."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, param_dtype=self.param_dtype,
                        dtype=x.dtype, name="dense")(x)


class SFTLayer(nn.Module):
    """Spatial feature transform: x*(scale+1)+shift, scale/shift via two 1x1
    convs each from a spatial condition map. Reference `LiteISP.py:293-305`."""

    out_nc: int = 64
    nf: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fea, cond):
        s = Conv2d(self.nf, 1, 1, 0, param_dtype=self.param_dtype, name="scale0")(cond)
        s = Conv2d(self.out_nc, 1, 1, 0, param_dtype=self.param_dtype, name="scale1")(leaky_relu(s, 0.1))
        t = Conv2d(self.nf, 1, 1, 0, param_dtype=self.param_dtype, name="shift0")(cond)
        t = Conv2d(self.out_nc, 1, 1, 0, param_dtype=self.param_dtype, name="shift1")(leaky_relu(t, 0.1))
        return fea * (s + 1) + t


class GFMLayer(nn.Module):
    """Global feature modulation from a condition *vector*:
    x*scale + shift + x (per-channel). Reference `LiteISP.py:308-321`."""

    out_nc: int = 64
    nf: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fea, vec):
        s = Dense(self.nf, self.param_dtype, name="scale0")(vec)
        s = Dense(self.out_nc, self.param_dtype, name="scale1")(leaky_relu(s, 0.1))
        t = Dense(self.nf, self.param_dtype, name="shift0")(vec)
        t = Dense(self.out_nc, self.param_dtype, name="shift1")(leaky_relu(t, 0.1))
        return fea * s[:, None, None, :] + t[:, None, None, :] + fea


class ResGFM(nn.Module):
    """Workhorse modulation block (reference `Res_GFM`, `LiteISP.py:537-559`):
    conv -> FiLM(x*scale+shift+x from vector) -> LReLU -> conv, + residual."""

    chan: int = 32
    nf: int = 64
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vec, layout: str = "nhwc"):
        fea = Conv2d(self.chan, 3, 1, 1, param_dtype=self.param_dtype, name="conv0")(x, layout)
        s = Dense(self.nf, self.param_dtype, name="scale0")(vec)
        s = Dense(self.chan, self.param_dtype, name="scale1")(leaky_relu(s, 0.1))
        t = Dense(self.nf, self.param_dtype, name="shift0")(vec)
        t = Dense(self.chan, self.param_dtype, name="shift1")(leaky_relu(t, 0.1))
        if layout == "bhcw":
            fea = fea * s[:, None, :, None] + t[:, None, :, None] + fea
        else:
            fea = fea * s[:, None, None, :] + t[:, None, None, :] + fea
        fea = leaky_relu(fea, 0.01)  # torch nn.LeakyReLU() default slope
        fea = Conv2d(self.chan, 3, 1, 1, param_dtype=self.param_dtype, name="conv1")(fea, layout)
        return fea + x


class SpatialFeatureTransform(nn.Module):
    """SFT: x*scale+shift [+x]. Reference `LiteISP.py:562-599` /
    `raw2bit.py:860-886`. ada_method 'vanilla' = two 3x3-conv stacks;
    'cbam' = 1x1 conv -> relu -> CBAM gate per branch (the reference's
    'cbam' branch imports a module that was never shipped, `LiteISP.py:3`;
    this is the working reconstruction via ops/cbam.py)."""

    n_features: int
    residual: bool = True
    ada_method: str = "vanilla"  # 'vanilla' | 'cbam'
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fea, cond):
        pd = self.param_dtype
        if self.ada_method == "cbam":
            from realcamnet_tpu.ops.cbam import CBAM

            s = Conv2d(self.n_features, 1, 1, 0, param_dtype=pd, name="scale0")(cond)
            s = CBAM(self.n_features, param_dtype=pd, name="scale_cbam")(jax.nn.relu(s))
            t = Conv2d(self.n_features, 1, 1, 0, param_dtype=pd, name="shift0")(cond)
            t = CBAM(self.n_features, param_dtype=pd, name="shift_cbam")(jax.nn.relu(t))
        else:
            s = Conv2d(self.n_features, 3, 1, 1, param_dtype=pd, name="scale0")(cond)
            s = Conv2d(self.n_features, 3, 1, 1, param_dtype=pd, name="scale1")(jax.nn.relu(s))
            t = Conv2d(self.n_features, 3, 1, 1, param_dtype=pd, name="shift0")(cond)
            t = Conv2d(self.n_features, 3, 1, 1, param_dtype=pd, name="shift1")(jax.nn.relu(t))
        out = fea * s + t
        return out + fea if self.residual else out


class ResBlockWithModulation(nn.Module):
    """GFM -> conv -> SFT -> conv, residual (reference `LiteISP.py:326-343`)."""

    nf: int = 64
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fea, vec, spatial_cond):
        h = GFMLayer(self.nf, self.nf, self.param_dtype, name="gfm")(fea, vec)
        h = jax.nn.relu(Conv2d(self.nf, 3, 1, 1, kernel_init=scaled_kaiming,
                               param_dtype=self.param_dtype, name="conv1")(h))
        h = SFTLayer(self.nf, self.nf, self.param_dtype, name="sft")(h, spatial_cond)
        h = Conv2d(self.nf, 3, 1, 1, kernel_init=scaled_kaiming,
                   param_dtype=self.param_dtype, name="conv2")(h)
        return fea + h


class ResGFMLFM(nn.Module):
    """GFM -> conv -> SFT(local cond) -> conv residual block
    (reference `Res_GFM_LFM`, `LiteISP.py:601-620`)."""

    out_nc: int = 32
    nf: int = 64
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fea, vec, local_cond):
        h = GFMLayer(self.out_nc, self.nf, self.param_dtype, name="gfm")(fea, vec)
        h = leaky_relu(Conv2d(self.out_nc, 3, 1, 1, param_dtype=self.param_dtype,
                              name="conv1")(h), 0.1)
        h = SFTLayer(self.out_nc, self.out_nc, self.param_dtype, name="lfm")(h, local_cond)
        h = Conv2d(self.out_nc, 3, 1, 1, param_dtype=self.param_dtype, name="conv2")(h)
        return fea + h


class LensShadingCorrection(nn.Module):
    """CADR core: 4x(1x1 conv + LReLU(0.1) except last) on the 2-ch
    normalized-coordinate map -> per-pixel gain features. Applied by callers as
    `fea * (lsc + 1)`. Reference `LiteISP.py:363-378`."""

    out_c: int = 32
    nf: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coord):
        h = Conv2d(self.nf, 1, 1, 0, param_dtype=self.param_dtype, name="conv0")(coord)
        h = leaky_relu(h, 0.1)
        h = Conv2d(self.nf, 1, 1, 0, param_dtype=self.param_dtype, name="conv1")(h)
        h = leaky_relu(h, 0.1)
        h = Conv2d(self.nf, 1, 1, 0, param_dtype=self.param_dtype, name="conv2")(h)
        h = leaky_relu(h, 0.1)
        return Conv2d(self.out_c, 1, 1, 0, param_dtype=self.param_dtype, name="conv3")(h)
