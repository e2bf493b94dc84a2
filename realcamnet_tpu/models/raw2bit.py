"""RealCamNet joint RAW->bitstream->sRGB models (reference `models/raw2bit.py`).

The reference ships 10 near-identical ~400-line classes (flagship
`raw_compression_tcm_final` at `raw2bit.py:1614` + ablations); here one
configurable module covers the whole matrix, driven by flags
{gft, lft, cadr, encoder/decoder/hyper block kinds, stem} per SURVEY.md §2.5.
Factory functions reproduce every reference configuration.

Paper-name mapping (SURVEY.md §2.5): CPE = ColorConditionGFM (global) +
HybridConditionModule (local); CADR = LensShadingCorrection + coord input;
CIMC encoder block = Res_GFM (GFT) + ConvTransBlockMzj (LFT + channel-atten
residual + Swin attention); CSA decoder block = ConvTransBlock; entropy model
= TCM ChARM.

Shapes: packed Bayer (B, H/2, W/2, 4) -> y (B, H/32, W/32, 320) ->
z (B, H/128, W/128, 192) -> decoded sRGB (B, H, W, 3).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.entropy.models import EntropyBottleneck, quantize_ste_offset
from realcamnet_tpu.models.tcm import CharmEntropyModel, ConvTransBlock
from realcamnet_tpu.ops.attention.wmsa import SwinTransformerBlock
from realcamnet_tpu.ops.blocks import Conv2d, RCAGroup
from realcamnet_tpu.ops.codec_layers import (
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv3x3,
)
from realcamnet_tpu.ops.color import ColorConditionGFM, HybridConditionModule
from realcamnet_tpu.ops.modulation import (
    LensShadingCorrection,
    ResGFM,
    SpatialFeatureTransform,
)

Dtype = Any


class CALayerLinear(nn.Module):
    """Linear-form channel attention (`raw2bit.py:238-254`): GAP -> FC(/r) ->
    ReLU -> FC -> sigmoid gate, no biases."""

    channels: int
    reduction: int = 16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(max(1, self.channels // self.reduction), use_bias=False,
                     param_dtype=self.param_dtype, dtype=x.dtype, name="fc0")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False,
                     param_dtype=self.param_dtype, dtype=x.dtype, name="fc1")(y)
        return x * jax.nn.sigmoid(y)[:, None, None, :]


class ResidualBlockWithCA(nn.Module):
    """conv3x3 -> lrelu -> conv3x3 -> CA, + skip (`raw2bit.py:257-289`)."""

    out_c: int
    reduction: int = 8
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        h = Conv2d(self.out_c, 3, 1, 1, param_dtype=self.param_dtype, name="conv1")(x)
        h = jnp.where(h >= 0, h, 0.01 * h)
        h = Conv2d(self.out_c, 3, 1, 1, param_dtype=self.param_dtype, name="conv2")(h)
        h = CALayerLinear(self.out_c, self.reduction,
                          param_dtype=self.param_dtype, name="ca")(h)
        if x.shape[-1] != self.out_c:
            identity = Conv2d(self.out_c, 1, 1, 0, param_dtype=self.param_dtype,
                              name="skip")(x)
        return h + identity


class ConvTransBlockMzj(nn.Module):
    """CIMC block (`raw2bit.py:292-328`, paper fig (d)): 1x1 split; conv half
    -> ResidualBlockWithCA -> SFT(local cond) + identity (LFT injection);
    trans half -> Swin block; concat 1x1; outer residual. (x, cond) -> x."""

    conv_dim: int
    trans_dim: int
    head_dim: int
    window_size: int
    drop_path_rate: float = 0.0
    shifted: bool = False
    param_dtype: Dtype = jnp.float32
    fused: bool = False  # BHCW Pallas conv half (ops/pallas_conv.py)

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        pd = self.param_dtype
        total = self.conv_dim + self.trans_dim
        if self.fused and not self.is_initializing():
            # Conv half (RBWithCA + SFT, all N=64 3x3 convs) as chained
            # BHCW Pallas convs — XLA lane-pads 64 -> 128 otherwise. The
            # split/merge 1x1s move the half into/out of BHCW via einsum
            # (no separate transpose pass); params identical to the plain
            # path (init traces it below).
            from realcamnet_tpu.ops.pallas_conv import (
                fused_residual_block_ca_bhcw, fused_sft_bhcw,
                merge_1x1_from_bhcw, split_1x1_to_bhcw)

            v = self.variables["params"]
            conv_x, trans_x = split_1x1_to_bhcw(
                x, v["conv1_1"]["conv"]["kernel"][0, 0],
                v["conv1_1"]["conv"]["bias"], self.conv_dim)
            cond_b = jnp.transpose(cond, (0, 1, 3, 2)).astype(conv_x.dtype)
            wd = conv_x.shape[3]
            wp = -(-wd // 128) * 128
            wv = wd if wp != wd else None
            if wp != wd:
                pad = ((0, 0), (0, 0), (0, 0), (0, wp - wd))
                conv_x = jnp.pad(conv_x, pad)
                cond_b = jnp.pad(cond_b, pad)
            h1 = fused_residual_block_ca_bhcw(
                v["conv_block"], conv_x, hw=x.shape[1] * wd, w_valid=wv)
            cx = fused_sft_bhcw(v["sft"], h1, cond_b, residual=True,
                                w_valid=wv) + conv_x
            if wp != wd:
                cx = cx[..., :wd]
            trans_x = SwinTransformerBlock(
                self.trans_dim, self.head_dim, self.window_size,
                self.shifted, self.drop_path_rate, pd,
                name="trans_block")(trans_x, train=train)
            res = merge_1x1_from_bhcw(cx, trans_x,
                                      v["conv1_2"]["conv"]["kernel"][0, 0],
                                      v["conv1_2"]["conv"]["bias"])
            return x + res
        h = Conv2d(total, 1, 1, 0, param_dtype=pd, name="conv1_1")(x)
        conv_x, trans_x = jnp.split(h, [self.conv_dim], axis=-1)
        conv_id = conv_x
        conv_x = ResidualBlockWithCA(self.conv_dim, 8, pd, name="conv_block")(conv_x)
        conv_x = SpatialFeatureTransform(self.conv_dim, residual=True,
                                         param_dtype=pd,
                                         name="sft")(conv_x, cond) + conv_id
        trans_x = SwinTransformerBlock(self.trans_dim, self.head_dim,
                                       self.window_size, self.shifted,
                                       self.drop_path_rate, pd,
                                       name="trans_block")(trans_x, train=train)
        res = Conv2d(total, 1, 1, 0, param_dtype=pd,
                     name="conv1_2")(jnp.concatenate([conv_x, trans_x], axis=-1))
        return x + res


class ConvGMABlock(nn.Module):
    """Conv + GMA hybrid block (`raw2bit.py:330-355`): 1x1 split; conv half
    -> ResidualBlock + identity; trans half -> one GMA linear-attention
    block over the full map; concat 1x1; outer residual.

    trans_dim must divide by 5 (GroupMix segments) and head_dim (the
    reference smoke-tests 64/80/10, `raw2bit.py:4362`)."""

    conv_dim: int
    trans_dim: int
    head_dim: int
    drop_path_rate: float = 0.0
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from realcamnet_tpu.ops.attention.gma import GMABlock

        pd = self.param_dtype
        total = self.conv_dim + self.trans_dim
        h = Conv2d(total, 1, 1, 0, param_dtype=pd, name="conv1_1")(x)
        conv_x, trans_x = jnp.split(h, [self.conv_dim], axis=-1)
        conv_x = ResidualBlock(self.conv_dim, pd, name="conv_block")(conv_x) + conv_x
        trans_x = GMABlock(self.trans_dim, self.trans_dim // self.head_dim,
                           drop_path_rate=self.drop_path_rate, param_dtype=pd,
                           name="trans_block")(trans_x, train=train)
        res = Conv2d(total, 1, 1, 0, param_dtype=pd,
                     name="conv1_2")(jnp.concatenate([conv_x, trans_x], axis=-1))
        return x + res


class RBU(nn.Module):
    """Residual block with sub-pixel upsample on both branches
    (`raw2bit.py:3181-3206`) — like ResidualBlockUpsample without the IGDN."""

    out_c: int
    upsample: int = 2
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pd = self.param_dtype
        h = SubpelConv3x3(self.out_c, self.upsample, pd, name="subpel")(x)
        h = jnp.where(h >= 0, h, 0.01 * h)
        h = Conv2d(self.out_c, 3, 1, 1, param_dtype=pd, name="conv")(h)
        identity = SubpelConv3x3(self.out_c, self.upsample, pd, name="upsample")(x)
        return h + identity


class RawCompression(nn.Module):
    """Configurable joint RAW codec covering the full reference ablation
    matrix (SURVEY.md §2.5)."""

    config: Sequence[int] = (2, 2, 2, 2, 2, 2, 2)
    head_dim: Sequence[int] = (8, 16, 32, 32, 16, 8, 8)
    n: int = 64
    m: int = 320
    num_slices: int = 5
    max_support_slices: int = 5
    drop_path_rate: float = 0.0
    # Ablation flags.
    use_gft: bool = True
    cond_c: int = 128
    use_lft: bool = True
    local_cond_c: Optional[int] = None  # default n
    use_cadr: bool = True
    encoder_block: str = "cimc"   # 'cimc' | 'swin' | 'conv'
    decoder_block: str = "swin"   # 'swin' | 'conv' | 'rcag'
    hyper_a_block: str = "swin"   # 'swin' | 'conv'
    hyper_s_block: str = "swin"   # 'swin' | 'conv' | 'rcag'
    stem: str = "conv_first"      # 'conv_first' | 'stride2'
    entropy_atten: str = "swin"   # 'swin' | 'gma' (reference `GMAAtten`)
    param_dtype: Dtype = jnp.float32
    # Perf knobs (outputs stay f32 where entropy math needs it):
    fused_conv: bool = False      # BHCW Pallas conv halves in hybrid blocks
    compute_dtype: Optional[Dtype] = None  # e.g. jnp.bfloat16 transforms
    # Matmul precision for the entropy-parameter subgraphs (h_synth /
    # slice_params / slice_lrp). "float32" (default) fixes XLA's f32
    # decomposition so SEPARATELY-compiled encode/decode programs agree
    # bit-for-bit — required by the one-dispatch compress(staged=False)
    # and by exact forward-vs-codec comparisons. The staged encode
    # (entropy/codec.py) replays the decoder's own executables, so codecs
    # built staged-only may set None (XLA default precision, faster charm
    # passes) without risking bitstream desync.
    entropy_precision: Optional[str] = "float32"

    def _ep(self):
        from contextlib import nullcontext

        return (jax.default_matmul_precision(self.entropy_precision)
                if self.entropy_precision else nullcontext())

    @property
    def window_size(self):
        return 8

    def setup(self):
        cfg, hd = self.config, self.head_dim
        N, N2, M = self.n, 2 * self.n, self.m
        pd = self.param_dtype
        total = sum(cfg)
        dpr = [self.drop_path_rate * i / max(1, total - 1) for i in range(total)]

        if self.use_gft:
            self.classifier = ColorConditionGFM(self.cond_c, pd, name="classifier")
            self.gfms = [
                ResGFM(N2, 4 * self.n, pd, name=f"gfm{k}") for k in range(3)
            ]
        if self.use_cadr:
            self.lsc = LensShadingCorrection(N2, N2, pd, name="lsc")
        if self.use_lft:
            lcc = self.local_cond_c or self.n
            self.local_condition = HybridConditionModule(
                lcc, 16, pd, fused=self.fused_conv, name="local_condition")

        if self.stem == "conv_first":
            self.conv_first = Conv2d(N2, 3, 1, 1, param_dtype=pd, name="conv_first")
            self.conv_down = ResidualBlockWithStride(N2, 2, pd, name="conv_down")
        else:  # 'stride2' (`raw2bit.py:3590`)
            self.conv_down = ResidualBlockWithStride(N2, 2, pd, name="conv_down")

        def enc_blocks(prefix, count, head_dim):
            out = []
            for i in range(count):
                if self.encoder_block == "cimc":
                    out.append(ConvTransBlockMzj(N, N, head_dim, 8, dpr[i],
                                                 bool(i % 2), pd,
                                                 fused=self.fused_conv,
                                                 name=f"{prefix}_{i}"))
                elif self.encoder_block == "swin":
                    out.append(ConvTransBlock(N, N, head_dim, 8, dpr[i],
                                              bool(i % 2), pd,
                                              fused=self.fused_conv,
                                              name=f"{prefix}_{i}"))
                elif self.encoder_block == "gma":
                    # GMA trans half must divide by 5 segments; mirror the
                    # reference smoke config (conv 64 / trans 80 / head 10,
                    # `raw2bit.py:4362`) scaled to the 2N stem width.
                    td = 80 if N2 > 80 else 5 * max(N2 // 10, 2)
                    out.append(ConvGMABlock(N2 - td, td, 10, dpr[i], pd,
                                            name=f"{prefix}_{i}"))
                else:
                    out.append(ResidualBlock(N2, pd, name=f"{prefix}_{i}"))
            return out

        self.m_down1 = enc_blocks("m_down1", cfg[0], hd[0])
        self.down1 = ResidualBlockWithStride(N2, 2, pd, name="down1")
        self.m_down2 = enc_blocks("m_down2", cfg[1], hd[1])
        self.down2 = ResidualBlockWithStride(N2, 2, pd, name="down2")
        self.m_down3 = enc_blocks("m_down3", cfg[2], hd[2])
        self.down3 = Conv2d(M, 3, 2, 1, param_dtype=pd, name="down3")

        def dec_blocks(prefix, count, head_dim, dim):
            out = []
            for i in range(count):
                if self.decoder_block == "swin":
                    out.append(ConvTransBlock(dim // 2, dim // 2, head_dim, 8,
                                              dpr[i], bool(i % 2), pd,
                                              fused=self.fused_conv,
                                              name=f"{prefix}_{i}"))
                elif self.decoder_block == "conv":
                    out.append(ResidualBlock(dim, pd, name=f"{prefix}_{i}"))
                else:  # rcag
                    out.append(RCAGroup(dim, nb=1, param_dtype=pd,
                                        name=f"{prefix}_{i}"))
            return out

        rcag = self.decoder_block == "rcag"
        up = RBU if rcag else ResidualBlockUpsample
        self.gs_stem = up(N2, 2, pd, name="gs_stem")
        self.m_up1 = dec_blocks("m_up1", cfg[3], hd[3], N2)
        self.up1 = up(N2, 2, pd, name="up1")
        self.m_up2 = dec_blocks("m_up2", cfg[4], hd[4], N2)
        self.up2 = up(N2, 2, pd, name="up2")
        if rcag:
            # `raw2bit.py:3252-3258`: narrow to N for the last stage + tail.
            self.up3_pre = ResidualBlock(N, pd, name="up3_pre")
            self.m_up3 = dec_blocks("m_up3", cfg[5], hd[5], N)
            self.up3 = RBU(N, 2, pd, name="up3")
            self.tail_block = RCAGroup(N, nb=1, param_dtype=pd, name="tail_block")
            self.tail_out = SubpelConv3x3(3, 2, pd, name="tail_out")
        else:
            self.m_up3 = dec_blocks("m_up3", cfg[5], hd[5], N2)
            self.up3 = SubpelConv3x3(N2, 2, pd, name="up3")
            self.tail_block = ResidualBlock(N2, pd, name="tail_block")
            self.tail_out = SubpelConv3x3(3, 2, pd, name="tail_out")

        hyper_hd = min(32, self.n)
        def hyper_blocks(prefix, count, kind):
            out = []
            for i in range(count):
                if kind == "swin":
                    out.append(ConvTransBlock(N, N, hyper_hd, 4, 0.0,
                                              bool(i % 2), pd, name=f"{prefix}_{i}"))
                elif kind == "rcag":
                    out.append(RCAGroup(N2, nb=1, param_dtype=pd,
                                        name=f"{prefix}_{i}"))
                else:
                    out.append(ResidualBlock(N2, pd, name=f"{prefix}_{i}"))
            return out

        self.ha_stem = ResidualBlockWithStride(N2, 2, pd, name="ha_stem")
        self.ha_blocks = hyper_blocks("ha", cfg[0], self.hyper_a_block)
        self.ha_out = Conv2d(192, 3, 2, 1, param_dtype=pd, name="ha_out")

        hs_up = RBU if self.hyper_s_block == "rcag" else ResidualBlockUpsample
        self.hms_stem = hs_up(N2, 2, pd, name="hms_stem")
        self.hms_blocks = hyper_blocks("hms", cfg[3], self.hyper_s_block)
        self.hms_out = SubpelConv3x3(M, 2, pd, name="hms_out")
        self.hss_stem = hs_up(N2, 2, pd, name="hss_stem")
        self.hss_blocks = hyper_blocks("hss", cfg[3], self.hyper_s_block)
        self.hss_out = SubpelConv3x3(M, 2, pd, name="hss_out")

        self.charm = CharmEntropyModel(self.m, self.num_slices,
                                       self.max_support_slices, 16, 8, pd,
                                       self.entropy_atten, name="charm")
        self.entropy_bottleneck = EntropyBottleneck(192, name="entropy_bottleneck")

    # ---- transforms ----

    def _cd(self, x):
        """Cast into the compute dtype (bf16 transforms; entropy-critical
        outputs are cast back to f32 at the producing method's exit)."""
        if x is None or self.compute_dtype is None:
            return x
        return x.astype(self.compute_dtype)

    def encode_with_aux(self, raw, cond=None, coord=None, train: bool = False):
        """Analysis pass. Returns (y, aux) with aux = {lft, lsc} extras."""
        raw, cond, coord = self._cd(raw), self._cd(cond), self._cd(coord)
        aux = {}
        vec = None
        if self.use_gft:
            vec = self.classifier(cond, train=train)
        lft = None
        if self.use_lft:
            lft = self.local_condition(raw)
            aux["lft"] = lft[2]

        if self.stem == "conv_first":
            fea = self.conv_first(raw)
            if self.use_cadr:
                lsc = self.lsc(coord)
                aux["lsc"] = lsc
                fea = fea * (lsc + 1)
            fea = self.conv_down(fea)
        else:
            fea = self.conv_down(raw)
            if self.use_cadr:
                # coord map at input res; gain applied post-stem at /2.
                lsc = self.lsc(coord[:, ::2, ::2, :])
                aux["lsc"] = lsc
                fea = fea * (lsc + 1)

        stages = ((self.m_down1, self.down1, 0), (self.m_down2, self.down2, 1),
                  (self.m_down3, self.down3, 2))
        for blocks, down, k in stages:
            if self.use_gft:
                fea = self.gfms[k](fea, vec)
            for b in blocks:
                if isinstance(b, ConvTransBlockMzj):
                    fea = b(fea, lft[k], train=train)
                elif isinstance(b, (ConvTransBlock, ConvGMABlock)):
                    fea = b(fea, train=train)
                else:
                    fea = b(fea)
            fea = down(fea)
        return fea, aux

    def encode(self, raw, cond=None, coord=None):
        """Codec entry: (y, z)."""
        y, _ = self.encode_with_aux(raw, cond, coord)
        return y, self.h_a(y)

    def g_s(self, y_hat, train: bool = False):
        h = self.gs_stem(self._cd(y_hat))
        for b in self.m_up1:
            h = b(h, train=train) if isinstance(b, ConvTransBlock) else b(h)
        h = self.up1(h)
        for b in self.m_up2:
            h = b(h, train=train) if isinstance(b, ConvTransBlock) else b(h)
        h = self.up2(h)
        if self.decoder_block == "rcag":
            h = self.up3_pre(h)
        for b in self.m_up3:
            h = b(h, train=train) if isinstance(b, ConvTransBlock) else b(h)
        h = self.up3(h)
        h = self.tail_block(h)
        # f32 output: sRGB metrics (PSNR ~37 dB) sit near bf16 resolution.
        return self.tail_out(h).astype(jnp.float32)

    def h_a(self, y, train: bool = False):
        h = self.ha_stem(self._cd(y))
        for b in self.ha_blocks:
            h = b(h, train=train) if isinstance(b, ConvTransBlock) else b(h)
        return self.ha_out(h)

    def h_synth(self, z_hat, train: bool = False):
        # f32 always AND matmul precision pinned 'highest': feeds the
        # entropy parameters, where encoder/decoder cross-program
        # bit-agreement is required (see slice_params). f32 dtype alone is
        # NOT enough on TPU — XLA may decompose f32 matmuls/convs into
        # different bf16 multi-pass algorithms per program (measured at 4K:
        # 9632/522k scale indexes differed between the encode program and
        # _dec_first, artifacts/wrans_idx_diag_r05.json); pinning the
        # precision fixes the algorithm choice so separately-compiled
        # programs agree. Costs ~2x on these small subgraphs (~7 ms at 4K).
        with self._ep():
            z_hat = z_hat.astype(jnp.float32)
            hm = self.hms_stem(z_hat)
            for b in self.hms_blocks:
                hm = (b(hm, train=train) if isinstance(b, ConvTransBlock)
                      else b(hm))
            means = self.hms_out(hm)
            hs = self.hss_stem(z_hat)
            for b in self.hss_blocks:
                hs = (b(hs, train=train) if isinstance(b, ConvTransBlock)
                      else b(hs))
            scales = self.hss_out(hs)
            return means, scales

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # ---- codec delegates ----

    def slice_params(self, latent_means, latent_scales, support_slices, i):
        """Codec-path entropy parameters — ALWAYS f32, even when
        compute_dtype=bf16. The bitstream requires the encoder's and
        decoder's separately-compiled slice_params programs to agree
        bit-for-bit on the quantized scale index; bf16 charm heads round
        differently across the two compilations, one index flips, and the
        rANS stream desyncs from that symbol on (measured:
        artifacts/decode_nan_bisect_r04.json — slice 1 idx_match False,
        desynced symbols ±1e9). f32 agreement is verified by the bit-exact
        round-trip drives."""
        f32 = jnp.float32
        # Matmul precision pinned for cross-program bit-agreement on TPU —
        # see h_synth (f32 dtype alone leaves the f32->bf16-passes
        # decomposition to per-program heuristics).
        with self._ep():
            return self.charm.slice_params(
                latent_means.astype(f32), latent_scales.astype(f32),
                [s.astype(f32) for s in support_slices], i)

    def slice_lrp(self, mean_support, y_hat_slice, i):
        with self._ep():
            return self.charm.slice_lrp(mean_support.astype(jnp.float32),
                                        y_hat_slice.astype(jnp.float32), i)

    def eb_medians(self):
        return self.entropy_bottleneck.medians()

    def eb_pmf_params(self, max_length: int = 256):
        return self.entropy_bottleneck.pmf_params(max_length)

    # ---- training forward (`raw2bit.py:1766-1855`) ----

    def __call__(self, raw, cond=None, coord=None, train: bool = False):
        y, aux = self.encode_with_aux(raw, cond, coord, train=train)
        z = self.h_a(y, train=train)
        _, z_lik = self.entropy_bottleneck(z, train=train)
        medians = jax.lax.stop_gradient(self.entropy_bottleneck.medians())
        z_hat = quantize_ste_offset(z.astype(jnp.float32),
                                    medians[None, None, None, :]).astype(z.dtype)
        latent_means, latent_scales = self.h_synth(z_hat, train=train)
        y_hat, y_lik, means, scales = self.charm(y, latent_means, latent_scales,
                                                 train=train)
        x_hat = self.g_s(y_hat, train=train)
        out = {
            "x_hat": x_hat,
            "y": y,
            "likelihoods": {"y": y_lik, "z": z_lik},
            "para": {"means": means, "scales": scales, "y": y},
        }
        out.update(aux)
        return out


# --------------------------------------------------------------------------
# Reference-model factories (class names from `models/raw2bit.py`).
# --------------------------------------------------------------------------

def raw_compression_tcm_final(**kw) -> RawCompression:
    """THE RealCamNet model (`raw2bit.py:1614-2027`): GFT(cond_c=128) + LFT +
    CADR + CIMC encoder / CSA decoder + ChARM."""
    return RawCompression(**kw)


def raw_compression_tcm(**kw) -> RawCompression:
    """First joint model (`raw2bit.py:361-727`): GFT(cond_c=64) + CADR, plain
    TCM ConvTransBlocks, no LFT."""
    kw.setdefault("cond_c", 64)
    return RawCompression(use_lft=False, encoder_block="swin", **kw)


def raw_compression_tcm_xiaorong1(**kw) -> RawCompression:
    """'ISP yes / transformer no' (`raw2bit.py:890-1264`)."""
    return RawCompression(use_lft=False, encoder_block="conv",
                          decoder_block="conv", hyper_a_block="conv",
                          hyper_s_block="conv", **kw)


def raw_compression_tcm_xiaorong2(**kw) -> RawCompression:
    """Bare conv codec for raw (`raw2bit.py:1269-1610`)."""
    return RawCompression(use_gft=False, use_lft=False, use_cadr=False,
                          encoder_block="conv", decoder_block="conv",
                          hyper_a_block="conv", hyper_s_block="conv", **kw)


def raw_compression_tcm_final_xiaorong1(**kw) -> RawCompression:
    """'transformer + CADR' (`raw2bit.py:2034-2410`)."""
    return RawCompression(use_gft=False, use_lft=False, encoder_block="swin", **kw)


def raw_compression_tcm_final_xiaorong2(**kw) -> RawCompression:
    """'CADR only' (`raw2bit.py:2793-3177`)."""
    return RawCompression(use_gft=False, use_lft=False, encoder_block="conv",
                          decoder_block="conv", hyper_a_block="conv",
                          hyper_s_block="conv", **kw)


def raw_compression_tcm_final_rcag(**kw) -> RawCompression:
    """Conv encoder + RCAGroup/RBU decoder + RBU hyper-synthesis
    (`raw2bit.py:3209-3563`)."""
    kw.setdefault("config", (1, 1, 1, 1, 1, 1, 1))
    return RawCompression(use_gft=False, use_lft=False, use_cadr=False,
                          encoder_block="conv", decoder_block="rcag",
                          hyper_a_block="conv", hyper_s_block="rcag",
                          stem="stride2", **kw)


def raw_compression_tcm_final_xiaorong3(**kw) -> RawCompression:
    """Plain codec, stride-2 stem, Swin hyper (`raw2bit.py:3567-3962`)."""
    return RawCompression(use_gft=False, use_lft=False, use_cadr=False,
                          encoder_block="conv", decoder_block="conv",
                          stem="stride2", **kw)


def raw_compression_tcm_final_xiaorong3_(**kw) -> RawCompression:
    """Same with conv_first stride-1 stem and conv hyper
    (`raw2bit.py:3966-4355`, ha/hs ResidualBlocks at 4042-4056)."""
    return RawCompression(use_gft=False, use_lft=False, use_cadr=False,
                          encoder_block="conv", decoder_block="conv",
                          hyper_a_block="conv", hyper_s_block="conv", **kw)


def raw_compression_tcm_final_gma(**kw) -> RawCompression:
    """Flagship with GMA entropy attention instead of Swin (component
    variant from `raw2bit.py:169-234`)."""
    return RawCompression(entropy_atten="gma", **kw)


def raw_compression_tcm_gma_encoder(**kw) -> RawCompression:
    """GMA-encoder variant: ConvGMABlock (`raw2bit.py:330-355`) in place of
    the Swin ConvTransBlock (smoke-only in the reference, `raw2bit.py:4362`)."""
    return RawCompression(use_lft=False, encoder_block="gma", **kw)


RAW2BIT_MODELS = {
    "raw_compression_tcm_gma_encoder": raw_compression_tcm_gma_encoder,
    "raw_compression_tcm_final_gma": raw_compression_tcm_final_gma,
    "raw_compression_tcm": raw_compression_tcm,
    "raw_compression_tcm_xiaorong1": raw_compression_tcm_xiaorong1,
    "raw_compression_tcm_xiaorong2": raw_compression_tcm_xiaorong2,
    "raw_compression_tcm_final": raw_compression_tcm_final,
    "raw_compression_tcm_final_xiaorong1": raw_compression_tcm_final_xiaorong1,
    "raw_compression_tcm_final_xiaorong2": raw_compression_tcm_final_xiaorong2,
    "raw_compression_tcm_final_rcag": raw_compression_tcm_final_rcag,
    "raw_compression_tcm_final_xiaorong3": raw_compression_tcm_final_xiaorong3,
    "raw_compression_tcm_final_xiaorong3_": raw_compression_tcm_final_xiaorong3_,
}
