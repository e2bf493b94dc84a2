"""Color-prior encoders (global GFM vectors + local condition maps).

References: `LiteISP.py:23-30` (color_block), `LiteISP.py:33-82`
(Color_Condition multi-scale), `LiteISP.py:345-361` (Color_Condition_GFM —
the flagship global color encoder), `LiteISP.py:381-498` (HyCondMod UNet
parts + LFMConditionModule), `LiteISP.py:501-534` (Color_Condition_GFM_LFM),
`raw2bit.py:817-858` (HybridConditionModule — RealCamNet's local color
encoder).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.ops.blocks import (
    Conv2d,
    ConvTranspose2d,
    InstanceNorm,
    avg_pool,
    leaky_relu,
    max_pool,
    upsample_bilinear,
)

Dtype = Any


class ColorBlock(nn.Module):
    """1x1 conv -> avgpool(3,s2,p1) -> LeakyReLU(0.2) [-> InstanceNorm].

    Reference `color_block`, `LiteISP.py:23-30`. Halves spatial size.
    """

    out_c: int
    normalization: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.out_c, 1, 1, 0, param_dtype=self.param_dtype, name="conv")(x)
        x = avg_pool(x, 3, 2, 1, count_include_pad=True)
        x = leaky_relu(x, 0.2)
        if self.normalization:
            x = InstanceNorm(affine=True, param_dtype=self.param_dtype, name="norm")(x)
        return x


class ColorConditionGFM(nn.Module):
    """Flagship global color encoder: 5 ColorBlocks (16,32,64,128,128) +
    dropout(0.5) + 1x1 -> out_c + global average pool -> (B, out_c) vector.

    Reference `Color_Condition_GFM`, `LiteISP.py:345-361`.
    """

    out_c: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond, train: bool = False):
        widths = (16, 32, 64, 128, 128)
        norms = (True, True, True, True, False)
        h = cond
        for i, (w, nrm) in enumerate(zip(widths, norms)):
            h = ColorBlock(w, nrm, self.param_dtype, name=f"block{i}")(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = Conv2d(self.out_c, 1, 1, 0, param_dtype=self.param_dtype, name="proj")(h)
        return jnp.mean(h, axis=(1, 2))  # (B, out_c)


class ColorCondition(nn.Module):
    """Multi-scale color prior: conv stem -> global vector + 4 local feature
    maps at 1/1, 1/2, 1/4, 1/8. Reference `Color_Condition`, `LiteISP.py:33-82`.

    Returns (gfm_vector (B,cond_c), [feat@1, feat@1/2, feat@1/4, feat@1/8]).
    """

    cond_c: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = 32
        pd = self.param_dtype
        h = leaky_relu(Conv2d(nf, 3, 1, 1, param_dtype=pd, name="first0")(x), 0.1)
        h = leaky_relu(Conv2d(nf, 2, 2, 0, param_dtype=pd, name="first1")(h), 0.1)
        h = leaky_relu(Conv2d(nf, 1, 1, 0, param_dtype=pd, name="first2")(h), 0.1)
        h = leaky_relu(Conv2d(nf, 1, 1, 0, param_dtype=pd, name="first3")(h), 0.1)

        g = h
        for i, (w, nrm) in enumerate(
            zip((nf, nf * 2, nf * 4, nf * 4), (True, True, True, False))
        ):
            g = ColorBlock(w, nrm, pd, name=f"glob{i}")(g)
        g = nn.Dropout(0.5, deterministic=not train)(g)
        g = Conv2d(self.cond_c, 1, 1, 0, param_dtype=pd, name="glob_proj")(g)
        vec = jnp.mean(g, axis=(1, 2))

        f1 = Conv2d(nf, 1, 1, 0, param_dtype=pd, name="cond1_0")(h)
        f1 = Conv2d(self.cond_c, 1, 1, 0, param_dtype=pd, name="cond1_1")(leaky_relu(f1, 0.1))
        f2 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond2_0")(h)
        f2 = Conv2d(self.cond_c, 1, 1, 0, param_dtype=pd, name="cond2_1")(leaky_relu(f2, 0.1))
        f3 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond3_0")(h)
        f3 = leaky_relu(f3, 0.1)
        f3 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond3_1")(f3)
        f3 = Conv2d(self.cond_c, 1, 1, 0, param_dtype=pd, name="cond3_2")(leaky_relu(f3, 0.1))
        f4 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond4_0")(h)
        f4 = leaky_relu(f4, 0.1)
        f4 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond4_1")(f4)
        f4 = leaky_relu(f4, 0.1)
        f4 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond4_2")(f4)
        f4 = Conv2d(self.cond_c, 1, 1, 0, param_dtype=pd, name="cond4_3")(leaky_relu(f4, 0.1))
        return vec, [f1, f2, f3, f4]


class HyConvBlock(nn.Module):
    """conv3x3 + act. Reference `HyCondModConvBlock`, `LiteISP.py:381-395`."""

    out_c: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    act: str = "relu"
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, layout: str = "nhwc"):
        x = Conv2d(self.out_c, self.kernel_size, self.stride, self.padding,
                   param_dtype=self.param_dtype, name="conv")(x, layout)
        if self.act == "lrelu":
            return leaky_relu(x, 0.2)
        return jax.nn.relu(x)


class HyEncBlock(nn.Module):
    """Downscale x2 + conv. Reference `HyCondModEncBlock`, `LiteISP.py:397-416`."""

    out_c: int
    downscale_method: str = "stride"
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.downscale_method == "stride":
            x = HyConvBlock(self.out_c, stride=2, param_dtype=self.param_dtype, name="down")(x)
        elif self.downscale_method == "pool":
            x = max_pool(x, 2)
            x = HyConvBlock(self.out_c, param_dtype=self.param_dtype, name="down")(x)
        else:
            raise NotImplementedError(self.downscale_method)
        return HyConvBlock(self.out_c, param_dtype=self.param_dtype, name="conv")(x)


class HyDecBlock(nn.Module):
    """Upscale x2, concat skip, conv. Reference `HyCondModDecBlock`,
    `LiteISP.py:418-447`."""

    out_c: int
    upscale_method: str = "bilinear"
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, layout: str = "nhwc"):
        bhcw = layout == "bhcw"
        if self.upscale_method == "bilinear":
            if bhcw:
                from realcamnet_tpu.ops.blocks import upsample_bilinear_bhcw

                x = upsample_bilinear_bhcw(x, 2, align_corners=True)
            else:
                x = upsample_bilinear(x, 2, align_corners=True)
            x = HyConvBlock(self.out_c, param_dtype=self.param_dtype,
                            name="up")(x, layout)
        elif self.upscale_method == "transpose":
            x = ConvTranspose2d(self.out_c, 2, 2, param_dtype=self.param_dtype, name="up")(x)
        else:
            raise NotImplementedError(self.upscale_method)
        x = jnp.concatenate([skip, x], axis=2 if bhcw else -1)
        return HyConvBlock(self.out_c, param_dtype=self.param_dtype,
                           name="conv")(x, layout)


class LFMConditionModule(nn.Module):
    """3-level UNet producing a local condition map.

    Reference `LFMConditionModule`, `LiteISP.py:467-498`.
    """

    out_c: int
    mid_c: int = 16
    param_dtype: Dtype = jnp.float32
    fused: bool = False  # full-res segments in BHCW (ops/pallas_conv.py)

    @nn.compact
    def __call__(self, x):
        pd = self.param_dtype
        m = self.mid_c
        if self.fused and not self.is_initializing():
            # The full-resolution ends of the UNet run 16-64 channels —
            # XLA pads them to 128 lanes (8x/2x traffic at 4K). Run them in
            # the channel-sublane BHCW layout; the /2-and-below levels stay
            # NHWC (stride-2 convs). Params identical (init traces below).
            xb = jnp.transpose(x, (0, 1, 3, 2))
            x1b = HyConvBlock(m, param_dtype=pd, name="in_conv")(xb, "bhcw")
            x1 = jnp.transpose(x1b, (0, 1, 3, 2))  # NHWC once, for enc1
            x2 = HyEncBlock(m * 2, param_dtype=pd, name="enc1")(x1)
            x3 = HyEncBlock(m * 4, param_dtype=pd, name="enc2")(x2)
            x4 = HyEncBlock(m * 8, param_dtype=pd, name="enc3")(x3)
            y = HyDecBlock(m * 4, param_dtype=pd, name="dec1")(x4, x3)
            y = HyDecBlock(m * 2, param_dtype=pd, name="dec2")(y, x2)
            # dec3 at full res, in BHCW (bilinear up + conv + concat + conv).
            yb = jnp.transpose(y, (0, 1, 3, 2))
            yb = HyDecBlock(m, param_dtype=pd, name="dec3")(yb, x1b, "bhcw")
            fb = HyConvBlock(self.out_c, param_dtype=pd,
                             name="out_conv")(yb, "bhcw")
            return jnp.transpose(fb, (0, 1, 3, 2))
        x1 = HyConvBlock(m, param_dtype=pd, name="in_conv")(x)
        x2 = HyEncBlock(m * 2, param_dtype=pd, name="enc1")(x1)
        x3 = HyEncBlock(m * 4, param_dtype=pd, name="enc2")(x2)
        x4 = HyEncBlock(m * 8, param_dtype=pd, name="enc3")(x3)
        y = HyDecBlock(m * 4, param_dtype=pd, name="dec1")(x4, x3)
        y = HyDecBlock(m * 2, param_dtype=pd, name="dec2")(y, x2)
        y = HyDecBlock(m, param_dtype=pd, name="dec3")(y, x1)
        return HyConvBlock(self.out_c, param_dtype=pd, name="out_conv")(y)


class HybridConditionModule(nn.Module):
    """RealCamNet local color encoder (LFT): 3-level UNet over the packed raw
    -> full-res feature, then CondNet1/2/3 emit condition maps at /2, /4, /8
    matching the compression encoder's three stages.

    Reference `HybridConditionModule`, `raw2bit.py:817-858`.
    Returns [cond@/2, cond@/4, cond@/8] each with local_cond_c channels.
    """

    cond_c: int = 64
    mid_c: int = 16
    param_dtype: Dtype = jnp.float32
    fused: bool = False  # BHCW full-res UNet segments (see LFMConditionModule)

    @nn.compact
    def __call__(self, raw):
        pd = self.param_dtype
        nf = self.cond_c
        feat = LFMConditionModule(nf, self.mid_c, param_dtype=pd,
                                  fused=self.fused, name="unet")(raw)
        # CondNet topologies exactly as `raw2bit.py:843-857`: CondNet1 ends in
        # a 1x1 conv, CondNet2/3 end in a bare stride-2 conv (no trailing 1x1
        # or activation).
        c1 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond1_0")(feat)
        c1 = Conv2d(self.cond_c, 1, 1, 0, param_dtype=pd, name="cond1_1")(leaky_relu(c1, 0.1))
        c2 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond2_0")(feat)
        c2 = leaky_relu(c2, 0.1)
        c2 = Conv2d(self.cond_c, 3, 2, 1, param_dtype=pd, name="cond2_1")(c2)
        c3 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond3_0")(feat)
        c3 = leaky_relu(c3, 0.1)
        c3 = Conv2d(nf, 3, 2, 1, param_dtype=pd, name="cond3_1")(c3)
        c3 = leaky_relu(c3, 0.1)
        c3 = Conv2d(self.cond_c, 3, 2, 1, param_dtype=pd, name="cond3_2")(c3)
        return [c1, c2, c3]


class ColorConditionGFMLFM(nn.Module):
    """Global vector from the full-res raw (6 ColorBlock downs -> 384ch ->
    dropout(0.8) -> GAP) + local features from the patch via a conv stem.

    Reference `Color_Condition_GFM_LFM`, `LiteISP.py:501-534`.
    """

    gfm_out_c: int = 32
    lfm_out_c: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, global_raw, local_patch, train: bool = False):
        pd = self.param_dtype
        widths = (16, 32, 64, 128, 256, 384)
        norms = (True, True, True, True, True, False)
        g = global_raw
        for i, (w, nrm) in enumerate(zip(widths, norms)):
            g = ColorBlock(w, nrm, pd, name=f"down{i}")(g)
        g = nn.Dropout(0.8, deterministic=not train)(g)
        g = Conv2d(self.gfm_out_c, 1, 1, 0, param_dtype=pd, name="glob_proj")(g)
        vec = jnp.mean(g, axis=(1, 2))
        # The reference re-assigns cond_first to a single conv (`LiteISP.py:531`).
        lfm = Conv2d(self.lfm_out_c, 3, 1, 1, param_dtype=pd, name="cond_first")(local_patch)
        return vec, lfm


class ColorConditionUnet(nn.Module):
    """5 ColorBlock down-stack -> global out_c vector + a local feature map:
    the /32 bottleneck is upsampled back to input resolution, dropped out, and
    projected (1x1 conv + avgpool(3,s1,p1) + LReLU 0.2).

    Reference `Color_ConditionUnet`, `LiteISP.py:253-291`.
    """

    out_c: int = 6
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pd = self.param_dtype
        widths = (16, 32, 64, 128, 128)
        norms = (True, True, True, True, False)
        h = x
        for i, (w, nrm) in enumerate(zip(widths, norms)):
            h = ColorBlock(w, nrm, pd, name=f"down{i}")(h)
        g = nn.Dropout(0.5, deterministic=not train)(h)
        g = Conv2d(self.out_c, 1, 1, 0, param_dtype=pd, name="glob_proj")(g)
        vec = jnp.mean(g, axis=(1, 2))
        # F.upsample default mode is 'nearest' (`LiteISP.py:281`).
        from realcamnet_tpu.ops.blocks import resize_nearest

        feat = resize_nearest(h, (x.shape[1], x.shape[2]))
        feat = nn.Dropout(0.5, deterministic=not train)(feat)
        feat = Conv2d(self.out_c, 1, 1, 0, param_dtype=pd, name="local_proj")(feat)
        feat = avg_pool(feat, 3, 1, 1, count_include_pad=True)
        feat = leaky_relu(feat, 0.2)
        return vec, feat
