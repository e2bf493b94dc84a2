"""TCM learned image compression (reference `models/tcm.py:320-637`).

Transformer-CNN mixture codec: ConvTransBlock analysis/synthesis transforms,
hyperprior, and a 5-slice channel-autoregressive (ChARM) entropy model with
Swin-attention parameter heads. NHWC / flax; the serial slice loop is
statically unrolled (per-slice weight shapes differ — SURVEY.md §7.3.2).

Shapes (input (B,H,W,3)): y (B,H/16,W/16,320), z (B,H/64,W/64,192).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.entropy.models import (
    EntropyBottleneck,
    GaussianConditional,
    quantize_ste_offset,
    ste_round,
)
from realcamnet_tpu.ops.attention.wmsa import SwinBlockPair, SwinTransformerBlock
from realcamnet_tpu.ops.blocks import Conv2d
from realcamnet_tpu.ops.codec_layers import (
    AttentionBlock,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    ResidualUnit,
    SubpelConv3x3,
)

Dtype = Any


class ConvTransBlock(nn.Module):
    """TCM hybrid block (`tcm.py:242-268`): 1x1 -> split into conv/trans
    halves; conv half -> ResidualBlock (+extra residual); trans half -> Swin
    block; concat -> 1x1; outer residual."""

    conv_dim: int
    trans_dim: int
    head_dim: int
    window_size: int
    drop_path_rate: float = 0.0
    shifted: bool = False
    param_dtype: Dtype = jnp.float32
    fused: bool = False  # BHCW Pallas conv half (ops/pallas_conv.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        pd = self.param_dtype
        total = self.conv_dim + self.trans_dim
        if self.fused and not self.is_initializing():
            # Conv half in the channel-sublane BHCW layout: the N=64 convs
            # lane-pad to 128 under XLA (2x traffic/MXU waste); the split
            # 1x1s write/read the half directly in BHCW via einsum. Params
            # are identical to the plain path (init traces it below).
            from realcamnet_tpu.ops.pallas_conv import (
                fused_residual_block_bhcw, merge_1x1_from_bhcw,
                split_1x1_to_bhcw)

            v = self.variables["params"]
            conv_x, trans_x = split_1x1_to_bhcw(
                x, v["conv1_1"]["conv"]["kernel"][0, 0],
                v["conv1_1"]["conv"]["bias"], self.conv_dim)
            wd = conv_x.shape[3]
            wp = -(-wd // 128) * 128
            wv = wd if wp != wd else None
            if wp != wd:
                conv_x = jnp.pad(conv_x, ((0, 0), (0, 0), (0, 0), (0, wp - wd)))
            cx = fused_residual_block_bhcw(v["conv_block"], conv_x,
                                           w_valid=wv) + conv_x
            if wp != wd:
                cx = cx[..., :wd]
            trans_x = SwinTransformerBlock(
                self.trans_dim, self.head_dim, self.window_size, self.shifted,
                self.drop_path_rate, pd, name="trans_block")(trans_x,
                                                             train=train)
            res = merge_1x1_from_bhcw(cx, trans_x,
                                      v["conv1_2"]["conv"]["kernel"][0, 0],
                                      v["conv1_2"]["conv"]["bias"])
            return x + res
        h = Conv2d(total, 1, 1, 0, param_dtype=pd, name="conv1_1")(x)
        conv_x, trans_x = jnp.split(h, [self.conv_dim], axis=-1)
        conv_x = ResidualBlock(self.conv_dim, param_dtype=pd, name="conv_block")(conv_x) + conv_x
        trans_x = SwinTransformerBlock(
            self.trans_dim, self.head_dim, self.window_size, self.shifted,
            self.drop_path_rate, pd, name="trans_block")(trans_x, train=train)
        res = Conv2d(total, 1, 1, 0, param_dtype=pd,
                     name="conv1_2")(jnp.concatenate([conv_x, trans_x], axis=-1))
        return x + res


class SWAtten(nn.Module):
    """Swin-gated attention block for the entropy heads (`tcm.py:270-291`):
    AttentionBlock with the non-local branch replaced by a W+SW Swin pair;
    1x1 in/out projections to inter_dim."""

    output_dim: int
    head_dim: int
    window_size: int
    drop_path_rate: float = 0.0
    inter_dim: int = 128
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pd = self.param_dtype
        n = self.inter_dim
        x = Conv2d(n, 1, 1, 0, param_dtype=pd, name="in_conv")(x)
        identity = x
        z = SwinBlockPair(n, self.head_dim, self.window_size,
                          self.drop_path_rate, pd, name="non_local")(x, train=train)
        a = x
        for i in range(3):
            a = ResidualUnit(n, pd, name=f"a{i}")(a)
        b = z
        for i in range(3):
            b = ResidualUnit(n, pd, name=f"b{i}")(b)
        b = Conv2d(n, 1, 1, 0, param_dtype=pd, name="b3")(b)
        out = a * jax.nn.sigmoid(b) + identity
        return Conv2d(self.output_dim, 1, 1, 0, param_dtype=pd, name="out_conv")(out)


class GMAAtten(nn.Module):
    """GMA-flavored entropy attention gate (reference `GMAAtten`,
    `raw2bit.py:212-234`): AttentionBlock with the non-local branch replaced
    by two GMA blocks over the full map as tokens.

    The reference instantiates this with inter_dim=192, which its own
    5-segment GroupMix aggregator cannot split (dead code, SURVEY.md §0.1);
    here inter_dim defaults to 120 (divisible by 5 segments and 8 heads)."""

    output_dim: int
    head_dim: int = 16
    inter_dim: int = 120
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from realcamnet_tpu.ops.attention.gma import GMABlock

        pd = self.param_dtype
        n = self.inter_dim
        x = Conv2d(n, 1, 1, 0, param_dtype=pd, name="in_conv")(x)
        identity = x
        z = GMABlock(n, 8, param_dtype=pd, name="gma0")(x, train=train)
        z = GMABlock(n, 8, param_dtype=pd, name="gma1")(z, train=train)
        a = x
        for i in range(3):
            a = ResidualUnit(n, pd, name=f"a{i}")(a)
        b = z
        for i in range(3):
            b = ResidualUnit(n, pd, name=f"b{i}")(b)
        b = Conv2d(n, 1, 1, 0, param_dtype=pd, name="b3")(b)
        out = a * jax.nn.sigmoid(b) + identity
        return Conv2d(self.output_dim, 1, 1, 0, param_dtype=pd, name="out_conv")(out)


class ChARMHead(nn.Module):
    """One ChARM slice's parameter head: SWAtten (or GMAAtten) + 3-layer conv
    stack (`tcm.py:388-415`; GMA variant `raw2bit.py:212-234`)."""

    out_c: int
    head_dim: int = 16
    window_size: int = 8
    param_dtype: Dtype = jnp.float32
    atten_kind: str = "swin"  # 'swin' | 'gma'

    @nn.compact
    def __call__(self, support, train: bool = False):
        pd = self.param_dtype
        if self.atten_kind == "gma":
            h = GMAAtten(support.shape[-1], self.head_dim, 120, pd,
                         name="atten")(support, train=train)
        else:
            h = SWAtten(support.shape[-1], self.head_dim, self.window_size, 0.0,
                        128, pd, name="atten")(support, train=train)
        h = Conv2d(224, 3, 1, 1, param_dtype=pd, name="c0")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = Conv2d(128, 3, 1, 1, param_dtype=pd, name="c1")(h)
        h = jax.nn.gelu(h, approximate=False)
        return Conv2d(self.out_c, 3, 1, 1, param_dtype=pd, name="c2")(h)


class LRPHead(nn.Module):
    """Latent-residual-prediction head (`tcm.py:417-425`), 0.5*tanh bound."""

    out_c: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, support):
        pd = self.param_dtype
        h = Conv2d(224, 3, 1, 1, param_dtype=pd, name="c0")(support)
        h = jax.nn.gelu(h, approximate=False)
        h = Conv2d(128, 3, 1, 1, param_dtype=pd, name="c1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = Conv2d(self.out_c, 3, 1, 1, param_dtype=pd, name="c2")(h)
        return 0.5 * jnp.tanh(h)


class CharmEntropyModel(nn.Module):
    """Channel-wise autoregressive entropy parameter model shared by TCM and
    every raw2bit variant (`tcm.py:388-490`): per-slice SWAtten + conv heads
    over [hyper-latent (+) previously decoded slices], LRP correction."""

    m: int = 320
    num_slices: int = 5
    max_support_slices: int = 5
    head_dim: int = 16
    window_size: int = 8
    param_dtype: Dtype = jnp.float32
    atten_kind: str = "swin"  # 'swin' | 'gma'

    def setup(self):
        n = self.num_slices
        sc = self.m // n
        self.atten_mean = [ChARMHead(sc, self.head_dim, self.window_size,
                                     self.param_dtype, self.atten_kind,
                                     name=f"mean{i}")
                           for i in range(n)]
        self.atten_scale = [ChARMHead(sc, self.head_dim, self.window_size,
                                      self.param_dtype, self.atten_kind,
                                      name=f"scale{i}")
                            for i in range(n)]
        self.lrp = [LRPHead(sc, self.param_dtype, name=f"lrp{i}") for i in range(n)]
        self.gaussian = GaussianConditional(name="gaussian")

    def slice_params(self, latent_means, latent_scales, support_slices, i,
                     train: bool = False):
        mean_support = jnp.concatenate([latent_means] + support_slices, axis=-1)
        scale_support = jnp.concatenate([latent_scales] + support_slices, axis=-1)
        mu = self.atten_mean[i](mean_support, train=train)
        scale = self.atten_scale[i](scale_support, train=train)
        return mu, scale, mean_support

    def slice_lrp(self, mean_support, y_hat_slice, i):
        return self.lrp[i](jnp.concatenate([mean_support, y_hat_slice], axis=-1))

    def __call__(self, y, latent_means, latent_scales, train: bool = False):
        """Full training-path ChARM pass. Returns (y_hat, y_likelihoods,
        means, scales)."""
        # Hyper-synthesis upsamples 4x from z, which can overshoot y's size
        # for inputs not divisible by 64; the reference crops mu/scale per
        # slice (`tcm.py:466,471`) — cropping the latents up front is
        # equivalent and keeps the support concats consistent.
        latent_means = latent_means[:, : y.shape[1], : y.shape[2], :]
        latent_scales = latent_scales[:, : y.shape[1], : y.shape[2], :]
        slices = jnp.split(y, self.num_slices, axis=-1)
        y_hat_slices: List[jnp.ndarray] = []
        liks, mus, scales_l = [], [], []
        for i, y_slice in enumerate(slices):
            support = (y_hat_slices if self.max_support_slices < 0
                       else y_hat_slices[: self.max_support_slices])
            mu, scale, mean_support = self.slice_params(
                latent_means, latent_scales, support, i, train=train)
            _, lik = self.gaussian(y_slice, scale, mu, train=train)
            y_hat_slice = quantize_ste_offset(y_slice.astype(jnp.float32), mu.astype(jnp.float32))
            y_hat_slice = y_hat_slice + self.slice_lrp(mean_support, y_hat_slice.astype(y.dtype), i)
            y_hat_slices.append(y_hat_slice.astype(y.dtype))
            liks.append(lik)
            mus.append(mu)
            scales_l.append(scale)
        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        return (y_hat, jnp.concatenate(liks, axis=-1),
                jnp.concatenate(mus, axis=-1), jnp.concatenate(scales_l, axis=-1))


class TCM(nn.Module):
    """Full TCM codec (`tcm.py:320-490`). config/head_dim defaults mirror the
    reference constructor; window 8 in the main path, 4 in the hyper path."""

    config: Sequence[int] = (2, 2, 2, 2, 2, 2)
    head_dim: Sequence[int] = (8, 16, 32, 32, 16, 8)
    drop_path_rate: float = 0.0
    n: int = 64
    m: int = 320
    num_slices: int = 5
    max_support_slices: int = 5
    in_channels: int = 3
    param_dtype: Dtype = jnp.float32

    @property
    def window_size(self):
        return 8

    def setup(self):
        cfg, hd = self.config, self.head_dim
        N2 = 2 * self.n
        pd = self.param_dtype
        dpr = [float(x) for x in
               jnp.linspace(0, self.drop_path_rate, sum(cfg))] if self.drop_path_rate else [0.0] * sum(cfg)

        def stage(prefix, count, head_dim, window):
            return [ConvTransBlock(self.n, self.n, head_dim, window, dpr[i],
                                   shifted=bool(i % 2), param_dtype=pd,
                                   name=f"{prefix}_{i}")
                    for i in range(count)]

        self.ga_stem = ResidualBlockWithStride(N2, 2, pd, name="ga_stem")
        self.m_down1 = stage("m_down1", cfg[0], hd[0], 8)
        self.ga_down1 = ResidualBlockWithStride(N2, 2, pd, name="ga_down1")
        self.m_down2 = stage("m_down2", cfg[1], hd[1], 8)
        self.ga_down2 = ResidualBlockWithStride(N2, 2, pd, name="ga_down2")
        self.m_down3 = stage("m_down3", cfg[2], hd[2], 8)
        self.ga_out = Conv2d(self.m, 3, 2, 1, param_dtype=pd, name="ga_out")

        self.gs_stem = ResidualBlockUpsample(N2, 2, pd, name="gs_stem")
        self.m_up1 = stage("m_up1", cfg[3], hd[3], 8)
        self.gs_up1 = ResidualBlockUpsample(N2, 2, pd, name="gs_up1")
        self.m_up2 = stage("m_up2", cfg[4], hd[4], 8)
        self.gs_up2 = ResidualBlockUpsample(N2, 2, pd, name="gs_up2")
        self.m_up3 = stage("m_up3", cfg[5], hd[5], 8)
        self.gs_out = SubpelConv3x3(self.in_channels, 2, pd, name="gs_out")

        hyper_hd = min(32, self.n)  # reference hardcodes 32 (`tcm.py:360`)
        self.ha_stem = ResidualBlockWithStride(N2, 2, pd, name="ha_stem")
        self.ha_blocks = stage("ha", cfg[0], hyper_hd, 4)
        self.ha_out = Conv2d(192, 3, 2, 1, param_dtype=pd, name="ha_out")

        self.hms_stem = ResidualBlockUpsample(N2, 2, pd, name="hms_stem")
        self.hms_blocks = stage("hms", cfg[3], hyper_hd, 4)
        self.hms_out = SubpelConv3x3(self.m, 2, pd, name="hms_out")

        self.hss_stem = ResidualBlockUpsample(N2, 2, pd, name="hss_stem")
        self.hss_blocks = stage("hss", cfg[3], hyper_hd, 4)
        self.hss_out = SubpelConv3x3(self.m, 2, pd, name="hss_out")

        self.charm = CharmEntropyModel(self.m, self.num_slices,
                                       self.max_support_slices, 16, 8, pd,
                                       name="charm")
        self.entropy_bottleneck = EntropyBottleneck(192, name="entropy_bottleneck")

    # ---- transform pieces (exposed for compress/decompress) ----

    def g_a(self, x, train: bool = False):
        h = self.ga_stem(x)
        for b in self.m_down1:
            h = b(h, train=train)
        h = self.ga_down1(h)
        for b in self.m_down2:
            h = b(h, train=train)
        h = self.ga_down2(h)
        for b in self.m_down3:
            h = b(h, train=train)
        return self.ga_out(h)

    def g_s(self, y_hat, train: bool = False):
        h = self.gs_stem(y_hat)
        for b in self.m_up1:
            h = b(h, train=train)
        h = self.gs_up1(h)
        for b in self.m_up2:
            h = b(h, train=train)
        h = self.gs_up2(h)
        for b in self.m_up3:
            h = b(h, train=train)
        return self.gs_out(h)

    def h_a(self, y, train: bool = False):
        h = self.ha_stem(y)
        for b in self.ha_blocks:
            h = b(h, train=train)
        return self.ha_out(h)

    def h_synth(self, z_hat, train: bool = False):
        # Matmul precision pinned (configurable — see RawCompression
        # .entropy_precision): entropy parameters need cross-program
        # bit-agreement between the encode and decode compilations unless
        # the staged encode is used — see raw2bit.py and
        # wrans_idx_diag_r05.json.
        with self._ep():
            hm = self.hms_stem(z_hat)
            for b in self.hms_blocks:
                hm = b(hm, train=train)
            means = self.hms_out(hm)
            hs = self.hss_stem(z_hat)
            for b in self.hss_blocks:
                hs = b(hs, train=train)
            scales = self.hss_out(hs)
            return means, scales

    def z_entropy(self, z, train: bool = False):
        """(z_hat for decoding, z_likelihoods): STE round to medians for the
        path that feeds h_synth (`tcm.py:443-445`), noisy/rounded for bits."""
        _, z_lik = self.entropy_bottleneck(z, train=train)
        medians = jax.lax.stop_gradient(self.entropy_bottleneck.medians())
        z_hat = quantize_ste_offset(z.astype(jnp.float32), medians[None, None, None, :])
        return z_hat.astype(z.dtype), z_lik

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # ---- codec delegates (host-side compress/decompress, SURVEY.md §3.3-3.4)

    def encode(self, x):
        """Analysis pass for compression: returns (y, z)."""
        y = self.g_a(x)
        return y, self.h_a(y)

    def slice_params(self, latent_means, latent_scales, support_slices, i):
        with jax.default_matmul_precision("float32"):
            return self.charm.slice_params(latent_means, latent_scales,
                                           list(support_slices), i)

    def slice_lrp(self, mean_support, y_hat_slice, i):
        with jax.default_matmul_precision("float32"):
            return self.charm.slice_lrp(mean_support, y_hat_slice, i)

    def eb_medians(self):
        return self.entropy_bottleneck.medians()

    def eb_pmf_params(self, max_length: int = 256):
        return self.entropy_bottleneck.pmf_params(max_length)

    def __call__(self, x, train: bool = False):
        y = self.g_a(x, train=train)
        z = self.h_a(y, train=train)
        z_hat, z_lik = self.z_entropy(z, train=train)
        latent_means, latent_scales = self.h_synth(z_hat, train=train)
        y_hat, y_lik, means, scales = self.charm(y, latent_means, latent_scales,
                                                 train=train)
        x_hat = self.g_s(y_hat, train=train)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
            "para": {"means": means, "scales": scales, "y": y},
        }


def tcm(**kw) -> TCM:
    """Standalone TCM image codec (reference `tcm.py:320-637` treats it as a
    model in its own right; `__main__` harness at `tcm.py:642` profiles
    TCM(N=64) on 3-ch 512x512)."""
    return TCM(**kw)


# CLI registry: standalone 3-ch image-compression models (input convention
# x = sRGB image; the RD target is the input itself).
TCM_MODELS = {
    "TCM": tcm,
}
