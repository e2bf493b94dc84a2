"""LiteISP model zoo: learned RAW->sRGB ISPs (reference `models/LiteISP.py`).

Input convention (all models): packed Bayer raw (B,H,W,4), color-condition
image (B,Hc,Wc,4), normalized coordinate map (B,H,W,2); output sRGB at 2x
input resolution (B,2H,2W,3). The reference passes these as a list
`x=[raw,cond,coord]` (`LiteISP.py:2002-2035`); we take explicit arguments.

Instead of the reference's ~18 copy-pasted classes, each topology family is
one configurable flax module; factory functions at the bottom reproduce every
reference configuration (ablations included) by flags.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.ops.blocks import Conv2d, PReLU, RCAGroup, leaky_relu
from realcamnet_tpu.ops.color import (
    ColorCondition,
    ColorConditionGFM,
    ColorConditionGFMLFM,
)
from realcamnet_tpu.ops.dwt import dwt_forward, dwt_inverse
from realcamnet_tpu.ops.modulation import (
    Dense,
    GFMLayer,
    LensShadingCorrection,
    ResBlockWithModulation,
    ResGFM,
    ResGFMLFM,
)
from realcamnet_tpu.ops.pixel import pixel_shuffle

Dtype = Any


class LiteISPNet(nn.Module):
    """LiteISP topology (reference `LiteISPNet*`, `LiteISP.py:1710-2035,2322-2520`):

    head conv -> 3x(conv + RCAGroup + Haar-DWT) downs -> middle 2xRCAGroup ->
    3x(Haar-IWT + RCAGroup + conv) ups with additive skips -> conv+PS(2)+conv
    tail. Optional CADR lens-shading gain on head features and per-stage
    Res_GFM color modulation. `LiteISPNet_GFM_LSC` (ch_1=48, cond_c=32) is the
    flagship ISP profiled by the reference harness (`LiteISP.py:2659-2677`).
    """

    ch_1: int = 48
    ch_2: int = 128
    ch_3: int = 128
    n_blocks: int = 4
    cond_c: int = 32
    use_gfm: bool = True
    use_lsc: bool = True
    self_cond: bool = False  # GFMresize: condition on the raw itself
    # Per-stage Res_GFM hidden width; None -> (ch_1, ch_1, ch_1, ch_2) as in
    # LiteISPNet_GFM_LSC (`LiteISP.py:1938-1968`).
    gfm_nf: Optional[Tuple[int, int, int, int]] = None
    modulation_blocks: int = 1
    fused_rcab: bool = False  # Pallas fused RCAB chains (ops/pallas_conv.py)
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, raw, cond=None, coord=None, train: bool = False,
                 halo_axis: Optional[str] = None):
        """halo_axis: name of a mesh axis the H dimension is sharded over
        (call inside `shard_map`). Each stage then exchanges only ITS OWN
        receptive-field halo via `ppermute` at the stage's scale (the
        per-stage halo-exchange scaler, parallel/spatial.py) instead of
        whole-net halos up front; channel-attention pooling stays exact via
        band-cropped pmean, and the tiny middle stage runs replicated after
        an `all_gather` (its RF exceeds deep-scale band heights)."""
        pd = self.param_dtype
        ch_1, ch_2, ch_3, nb = self.ch_1, self.ch_2, self.ch_3, self.n_blocks
        gfm_nf = self.gfm_nf or (ch_1, ch_1, ch_1, ch_2)
        hx = halo_axis if not self.is_initializing() else None
        mb = self.modulation_blocks
        rf_rcag = 2 * nb + 1

        def fuse(ch):
            """fused_rcab='sub128' limits the BHCW kernel to channel counts
            XLA lane-pads (<128); wider groups keep the XLA path."""
            if hx is not None:
                return False  # staged-halo path: XLA convs (pooled CA)
            if self.fused_rcab == "sub128":
                return "bhcw" if ch < 128 else False
            return self.fused_rcab

        # With fused_rcab on, the whole trunk runs in the channel-sublane
        # BHCW layout (ops/pallas_conv.py): 3x3 convs hit the Pallas kernel,
        # DWT/PixelShuffle/elementwise stay XLA on unpadded arrays, and
        # layout converts exactly twice (entry/exit). Params are identical to
        # the NHWC path (init always traces NHWC).
        bhcw = (bool(self.fused_rcab) and not self.is_initializing()
                and hx is None)
        lay = "bhcw" if bhcw else "nhwc"
        from realcamnet_tpu.ops.dwt import dwt_forward_bhcw, dwt_inverse_bhcw
        from realcamnet_tpu.ops.pixel import pixel_shuffle_bhcw
        dwt_f = dwt_forward_bhcw if bhcw else dwt_forward
        dwt_i = dwt_inverse_bhcw if bhcw else dwt_inverse
        ps = pixel_shuffle_bhcw if bhcw else pixel_shuffle

        def ex(x, r):
            """Exchange r halo rows from the H-neighbors (no-op unsharded)."""
            if hx is None or r == 0:
                return x
            from realcamnet_tpu.parallel.spatial import _exchange_halo

            return _exchange_halo(x, r, hx)

        def crop(x, r):
            return x if (hx is None or r == 0) else x[:, r:x.shape[1] - r]

        def pool_of(band):
            return None if hx is None else (hx, band)

        x_in = jnp.transpose(raw, (0, 1, 3, 2)) if bhcw else raw
        # Segment A: head conv + LSC + mod1 (rf = 1 + 2*mb).
        r_a = 1 + (2 * mb if self.use_gfm else 0)
        x_a = ex(x_in, r_a)
        h = Conv2d(ch_1, 3, 1, 1, param_dtype=pd, name="head")(x_a, lay)
        if self.use_lsc:
            lsc = LensShadingCorrection(ch_1, ch_1, param_dtype=pd,
                                        name="lsc")(ex(coord, r_a))
            if bhcw:
                lsc = jnp.transpose(lsc, (0, 1, 3, 2))
            h = h * (lsc + 1)

        vec = None
        if self.use_gfm:
            src = raw if self.self_cond else cond
            vec = ColorConditionGFM(self.cond_c, param_dtype=pd, name="classifier")(src, train=train)

        def modulate(x, stage, chan, nf):
            if vec is None:
                return x
            for i in range(self.modulation_blocks):
                x = ResGFM(chan, nf, param_dtype=pd, name=f"mod{stage}_{i}")(x, vec, lay)
            return x

        h = crop(modulate(h, 1, ch_1, gfm_nf[0]), r_a)

        def seg_down(x, stage, mid, extra_head_conv, mod=None):
            """Down stage as one halo segment: exchange the segment's rf,
            run [modulate +] conv0 + RCAG [+ conv1], crop, DWT (DWT is
            per-2x2-block exact — no halo)."""
            band = x.shape[1]
            r = ((2 * mb if mod else 0) + 1 + rf_rcag
                 + (1 if extra_head_conv else 0))
            x = ex(x, r)
            if mod:
                x = modulate(x, *mod)
            x = Conv2d(mid, 3, 1, 1, param_dtype=pd, name=f"down{stage}_conv0")(x, lay)
            x = RCAGroup(mid, nb=nb, fused=fuse(mid), param_dtype=pd,
                         name=f"down{stage}_rcag")(x, lay, pool=pool_of(band))
            if extra_head_conv:
                x = Conv2d(mid, 3, 1, 1, param_dtype=pd, name=f"down{stage}_conv1")(x, lay)
            return dwt_f(crop(x, r))

        def seg_up(x, stage, mid, out_c):
            """Up stage: IWT (exact), exchange rf, RCAG + conv, crop."""
            x = dwt_i(x)
            band = x.shape[1]
            r = rf_rcag + 1
            x = ex(x, r)
            x = RCAGroup(mid, nb=nb, fused=fuse(mid), param_dtype=pd,
                         name=f"up{stage}_rcag")(x, lay, pool=pool_of(band))
            x = Conv2d(out_c, 3, 1, 1, param_dtype=pd, name=f"up{stage}_conv")(x, lay)
            return crop(x, r)

        d1 = seg_down(h, 1, ch_1, extra_head_conv=True)
        d2 = seg_down(d1, 2, ch_1, False, mod=(2, ch_1 * 4, gfm_nf[1]))
        d3 = seg_down(d2, 3, ch_2, False, mod=(3, ch_1 * 4, gfm_nf[2]))

        # Middle: at 1/8 scale the map is tiny but the segment rf (2*mb +
        # 2 + 2*rf_rcag) can exceed a band — gather the full map, compute
        # replicated (CA pooling then exact by construction), keep the band.
        if hx is not None:
            band8 = d3.shape[1]
            m_in = jax.lax.all_gather(d3, hx, axis=1, tiled=True)
        else:
            m_in = d3
        m = modulate(m_in, 4, ch_2 * 4, gfm_nf[3])
        m = Conv2d(ch_3, 3, 1, 1, param_dtype=pd, name="mid_conv0")(m, lay)
        m = RCAGroup(ch_3, nb=nb, fused=fuse(ch_3), param_dtype=pd, name="mid_rcag0")(m, lay)
        m = RCAGroup(ch_3, nb=nb, fused=fuse(ch_3), param_dtype=pd, name="mid_rcag1")(m, lay)
        m = Conv2d(ch_2 * 4, 3, 1, 1, param_dtype=pd, name="mid_conv1")(m, lay)
        m = m + m_in
        if hx is not None:
            i = jax.lax.axis_index(hx)
            m = jax.lax.dynamic_slice_in_dim(m, i * band8, band8, 1)

        u3 = seg_up(m, 3, ch_2, ch_1 * 4) + d2
        u2 = seg_up(u3, 2, ch_1, ch_1 * 4) + d1
        u1 = seg_up(u2, 1, ch_1, ch_1) + h

        # Tail: conv at packed scale + PixelShuffle(2) + conv at 2x.
        t = ex(u1, 2)
        t = Conv2d(ch_1 * 4, 3, 1, 1, param_dtype=pd, name="tail_conv0")(t, lay)
        t = ps(t, 2)
        out = Conv2d(3, 3, 1, 1, param_dtype=pd, name="tail_conv1")(t, lay)
        out = crop(out, 4)
        return jnp.transpose(out, (0, 1, 3, 2)) if bhcw else out


class ISPUNet(nn.Module):
    """Stride-conv UNet ISP family (reference `ISPUNet_*`/`ISPNet_modulation`/
    `ResUNet`, `LiteISP.py:662-1532,2038-2146,2522-2652`).

    Topology: intro conv -> 3x[modulation -> RCAGroup+conv+LReLU -> 2x2/s2
    down-conv] -> modulated middle (+res) -> 3x[1x1-conv+PixelShuffle up ->
    RCAGroup+conv -> modulation -> skip add] -> conv+PS(2)+conv tail.

    modulation: 'none' (ResUNet/ISPUNet_LSC), 'gfm' (Res_GFM from a global
    color vector), 'multiscale' (ResBlock_with_modulation fed by
    Color_Condition's per-scale maps), 'gfm_lfm' (Res_GFM_LFM fed by
    Color_Condition_GFM_LFM + per-scale CondNets).
    lsc_mode: 'none' | 'gain' (fea*(lsc+1)) | 'concat' (coord concat to input,
    ISPUNet_GFM_LSC1 `LiteISP.py:1498`).
    """

    chan: int = 32
    n_blocks: int = 2
    cond_c: int = 32
    modulation: str = "gfm"
    modulation_blocks: int = 1
    lsc_mode: str = "gain"
    lsc_nf: Optional[int] = None
    self_cond: bool = False
    use_skips: bool = True
    middle_nb_mult: int = 2
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, raw, cond=None, coord=None, train: bool = False):
        pd = self.param_dtype
        nb = self.n_blocks
        chans = [self.chan, self.chan * 2, self.chan * 4, self.chan * 8]

        vec = None
        local_feats = [None, None, None, None]
        if self.modulation == "gfm":
            src = raw if self.self_cond else cond
            vec = ColorConditionGFM(self.cond_c, param_dtype=pd, name="classifier")(src, train=train)
        elif self.modulation == "multiscale":
            vec, local_feats = ColorCondition(self.cond_c, param_dtype=pd, name="classifier")(cond, train=train)
        elif self.modulation == "gfm_lfm":
            vec, lfm = ColorConditionGFMLFM(self.cond_c, self.cond_c, param_dtype=pd,
                                            name="classifier")(cond, raw, train=train)
            cc = self.cond_c
            f = Conv2d(cc, 1, 1, 0, param_dtype=pd, name="condnet1_0")(lfm)
            local_feats[0] = Conv2d(cc, 1, 1, 0, param_dtype=pd, name="condnet1_1")(leaky_relu(f, 0.1))
            f = Conv2d(cc, 2, 2, 0, param_dtype=pd, name="condnet2_0")(lfm)
            local_feats[1] = Conv2d(cc, 1, 1, 0, param_dtype=pd, name="condnet2_1")(leaky_relu(f, 0.1))
            f = Conv2d(cc, 2, 2, 0, param_dtype=pd, name="condnet3_0")(lfm)
            f = Conv2d(cc, 2, 2, 0, param_dtype=pd, name="condnet3_1")(leaky_relu(f, 0.1))
            local_feats[2] = Conv2d(cc, 1, 1, 0, param_dtype=pd, name="condnet3_2")(leaky_relu(f, 0.1))
            f = Conv2d(cc, 2, 2, 0, param_dtype=pd, name="condnet4_0")(lfm)
            f = Conv2d(cc, 2, 2, 0, param_dtype=pd, name="condnet4_1")(leaky_relu(f, 0.1))
            f = Conv2d(cc, 2, 2, 0, param_dtype=pd, name="condnet4_2")(leaky_relu(f, 0.1))
            local_feats[3] = Conv2d(cc, 1, 1, 0, param_dtype=pd, name="condnet4_3")(leaky_relu(f, 0.1))

        def modulate(x, name, chan, level):
            # The reference assumes each local condition map lands exactly at
            # the feature resolution (true only for one cond/raw size ratio;
            # `Color_Condition.cond_first` downsamples by 2, `LiteISP.py:38`).
            # We resize to the feature's resolution so any cond size works.
            local = local_feats[level]
            if local is not None and local.shape[1:3] != x.shape[1:3]:
                from realcamnet_tpu.ops.blocks import resize_nearest

                local = resize_nearest(local, (x.shape[1], x.shape[2]))
            for i in range(self.modulation_blocks):
                if self.modulation == "gfm":
                    x = ResGFM(chan, chan * 2, param_dtype=pd, name=f"{name}_{i}")(x, vec)
                elif self.modulation == "multiscale":
                    x = ResBlockWithModulation(chan, param_dtype=pd,
                                               name=f"{name}_{i}")(x, vec, local)
                elif self.modulation == "gfm_lfm":
                    x = ResGFMLFM(chan, chan * 2, param_dtype=pd,
                                  name=f"{name}_{i}")(x, vec, local)
            return x

        x_in = raw
        if self.lsc_mode == "concat":
            x_in = jnp.concatenate([raw, coord], axis=-1)
        fea_intro = Conv2d(chans[0], 3, 1, 1, param_dtype=pd, name="intro")(x_in)
        if self.lsc_mode == "gain":
            lsc = LensShadingCorrection(chans[0], self.lsc_nf or chans[0],
                                        param_dtype=pd, name="lsc")(coord)
            fea_intro = fea_intro * (lsc + 1)

        def encoder(x, stage, chan, extra_head_conv):
            if extra_head_conv:
                x = Conv2d(chan, 3, 1, 1, param_dtype=pd, name=f"enc{stage}_pre")(x)
            x = RCAGroup(chan, nb=nb, param_dtype=pd, name=f"enc{stage}_rcag")(x)
            x = Conv2d(chan, 3, 1, 1, param_dtype=pd, name=f"enc{stage}_conv")(x)
            return leaky_relu(x, 0.1)

        fea = modulate(fea_intro, "enc_mod1", chans[0], 0)
        fea = encoder(fea, 1, chans[0], False)
        d1 = Conv2d(chans[1], 2, 2, 0, param_dtype=pd, name="down1")(fea)

        fea = modulate(d1, "enc_mod2", chans[1], 1)
        fea = encoder(fea, 2, chans[1], False)
        d2 = Conv2d(chans[2], 2, 2, 0, param_dtype=pd, name="down2")(fea)

        fea = modulate(d2, "enc_mod3", chans[2], 2)
        fea = encoder(fea, 3, chans[2], True)
        d3 = Conv2d(chans[3], 2, 2, 0, param_dtype=pd, name="down3")(fea)

        m = modulate(d3, "mid_mod", chans[3], 3)
        m = Conv2d(chans[3], 3, 1, 1, param_dtype=pd, name="mid_conv0")(m)
        m = RCAGroup(chans[3], nb=nb * self.middle_nb_mult, param_dtype=pd, name="mid_rcag")(m)
        m = Conv2d(chans[3], 3, 1, 1, param_dtype=pd, name="mid_conv1")(m)
        if self.use_skips:
            m = m + d3

        def up_and_decode(x, stage, chan, skip, level):
            # Reference: conv(chan_in, chan_in*2, 1) + PixelShuffle(2), i.e.
            # 4*chan_out channels pre-shuffle (`LiteISP.py:1292-1296`).
            x = Conv2d(chan * 4, 1, 1, 0, use_bias=False, param_dtype=pd, name=f"up{stage}_proj")(x)
            x = pixel_shuffle(x, 2)
            x = RCAGroup(chan, nb=nb, param_dtype=pd, name=f"dec{stage}_rcag")(x)
            x = Conv2d(chan, 3, 1, 1, param_dtype=pd, name=f"dec{stage}_conv")(x)
            if self.use_skips:
                x = modulate(x, f"dec_mod{stage}", chan, level)
                x = x + skip
            return x

        u3 = up_and_decode(m, 3, chans[2], d2, 2)
        u2 = up_and_decode(u3, 2, chans[1], d1, 1)
        u1 = up_and_decode(u2, 1, chans[0], fea_intro, 0)

        t = Conv2d(chans[0] * 4, 3, 1, 1, param_dtype=pd, name="tail_conv0")(u1)
        t = pixel_shuffle(t, 2)
        return Conv2d(3, 3, 1, 1, param_dtype=pd, name="tail_conv1")(t)


class ISPNetGFM(nn.Module):
    """Flat ISP: intro conv -> 6x Res_GFM(48ch) -> conv+PS(2)+conv -> GFM on
    RGB. Reference `ISPNet_gfm`, `LiteISP.py:624-658`."""

    chan: int = 48
    cond_c: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, raw, cond=None, coord=None, train: bool = False):
        pd = self.param_dtype
        vec = ColorConditionGFM(self.cond_c, param_dtype=pd, name="classifier")(cond, train=train)
        fea = Conv2d(self.chan, 3, 1, 1, param_dtype=pd, name="intro")(raw)
        for i in range(6):
            fea = ResGFM(self.chan, 64, param_dtype=pd, name=f"gfm{i}")(fea, vec)
        fea = Conv2d(self.chan * 4, 3, 1, 1, param_dtype=pd, name="end_conv0")(fea)
        fea = pixel_shuffle(fea, 2)
        fea = Conv2d(3, 3, 1, 1, param_dtype=pd, name="end_conv1")(fea)
        return GFMLayer(3, 64, param_dtype=pd, name="gfm_last")(fea, vec)


class MWISP(nn.Module):
    """MW-ISPNet baseline: DWT head/downs, deep RCAGroups (nb=20), DWT-inverse
    ups, PixelShuffle tail. Reference `MWISP`, `LiteISP.py:2149-2218`."""

    c1: int = 64
    c2: int = 128
    c3: int = 128
    n_b: int = 20
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, raw, cond=None, coord=None, train: bool = False):
        pd = self.param_dtype
        c1, c2, c3, nb = self.c1, self.c2, self.c3, self.n_b
        h1 = dwt_forward(raw)  # (H/2, 16)
        h2 = Conv2d(c1, 3, 1, 1, param_dtype=pd, name="down1_conv")(h1)
        h2 = PReLU(param_dtype=pd, name="down1_act")(h2)
        h2 = RCAGroup(c1, nb=nb, param_dtype=pd, name="down1_rcag")(h2)
        h3 = dwt_forward(h2)
        h3 = Conv2d(c2, 3, 1, 1, param_dtype=pd, name="down2_conv")(h3)
        h3 = PReLU(param_dtype=pd, name="down2_act")(h3)
        h3 = RCAGroup(c2, nb=nb, param_dtype=pd, name="down2_rcag")(h3)
        h4 = dwt_forward(h3)
        h4 = Conv2d(c3, 3, 1, 1, param_dtype=pd, name="down3_conv")(h4)
        h4 = PReLU(param_dtype=pd, name="down3_act")(h4)
        m = RCAGroup(c3, nb=nb, param_dtype=pd, name="mid_rcag0")(h4)
        m = RCAGroup(c3, nb=nb, param_dtype=pd, name="mid_rcag1")(m)
        u1 = Conv2d(c2 * 4, 3, 1, 1, param_dtype=pd, name="up1_conv")(m)
        u1 = PReLU(param_dtype=pd, name="up1_act")(u1)
        u1 = dwt_inverse(u1) + h3
        u2 = RCAGroup(c2, nb=nb, param_dtype=pd, name="up2_rcag")(u1)
        u2 = Conv2d(c1 * 4, 3, 1, 1, param_dtype=pd, name="up2_conv")(u2)
        u2 = PReLU(param_dtype=pd, name="up2_act")(u2)
        u2 = dwt_inverse(u2) + h2
        u3 = RCAGroup(c1, nb=nb, param_dtype=pd, name="up3_rcag")(u2)
        u3 = Conv2d(16, 3, 1, 1, param_dtype=pd, name="up3_conv")(u3) + h1
        t = dwt_inverse(u3)
        t = Conv2d(12, 3, 1, 1, param_dtype=pd, name="tail_conv")(t)
        return pixel_shuffle(t, 2)


class _GCAttention(nn.Module):
    """Global-context attention (GCNet ContextBlock): softmax-pooled context
    vector -> 1x1 bottleneck transform -> additive broadcast."""

    channels: int
    reduction: int = 8
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pd = self.param_dtype
        b, h, w, c = x.shape
        attn = Conv2d(1, 1, 1, 0, param_dtype=pd, name="mask")(x)  # (B,H,W,1)
        attn = jax.nn.softmax(attn.reshape(b, h * w, 1), axis=1)
        ctx = jnp.einsum("bnc,bnk->bkc", x.reshape(b, h * w, c), attn)  # (B,1,C)
        t = Conv2d(max(1, c // self.reduction), 1, 1, 0, param_dtype=pd,
                   name="t0")(ctx[:, :, None, :])
        t = jax.nn.relu(t)
        t = Conv2d(c, 1, 1, 0, param_dtype=pd, name="t1")(t)
        return x + t


class GCRDB(nn.Module):
    """Global-context residual dense block (AWNet `GCRDB`; the reference's
    copy at `LiteISP.py:2221-2318` imports it from a module that was never
    shipped — SURVEY.md §0.1 — so this is a from-scratch implementation of
    the published AWNet block): 4 dense 3x3 convs (growth g) + 1x1 fusion +
    global-context attention, residual."""

    channels: int
    growth: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pd = self.param_dtype
        feats = [x]
        for i in range(4):
            h = Conv2d(self.growth, 3, 1, 1, param_dtype=pd, name=f"dense{i}")(
                jnp.concatenate(feats, axis=-1))
            feats.append(leaky_relu(h, 0.2))
        fused = Conv2d(self.channels, 1, 1, 0, param_dtype=pd, name="fuse")(
            jnp.concatenate(feats, axis=-1))
        fused = _GCAttention(self.channels, param_dtype=pd, name="gc")(fused)
        return x + fused


class GCWTResDown(nn.Module):
    """AWNet wavelet downsample: strided-conv branch + Haar-DWT branch,
    summed; also returns the DWT coefficients for the decoder skip."""

    channels: int  # input channels; output 2x at half resolution
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pd = self.param_dtype
        dwt = dwt_forward(x)  # (H/2, 4C)
        down = Conv2d(2 * self.channels, 3, 2, 1, param_dtype=pd, name="down")(x)
        wt = Conv2d(2 * self.channels, 1, 1, 0, param_dtype=pd, name="wt")(dwt)
        return down + wt, dwt


class GCIWTResUp(nn.Module):
    """AWNet inverse-wavelet upsample: IWT of a 1x1-projected feature plus an
    IWT path over the encoder's stored DWT coefficients."""

    out_c: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_dwt):
        pd = self.param_dtype
        up = dwt_inverse(Conv2d(4 * self.out_c, 1, 1, 0, param_dtype=pd,
                                name="proj")(x))
        skip = Conv2d(self.out_c, 1, 1, 0, param_dtype=pd,
                      name="skip")(dwt_inverse(skip_dwt))
        return up + skip


class ShortcutBlock(nn.Module):
    """AWNet `shortcutblock`: conv-relu-conv + channel attention."""

    channels: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pd = self.param_dtype
        h = Conv2d(self.channels, 3, 1, 1, param_dtype=pd, name="conv0")(x)
        h = jax.nn.relu(h)
        h = Conv2d(self.channels, 3, 1, 1, param_dtype=pd, name="conv1")(h)
        from realcamnet_tpu.ops.blocks import CALayer

        return CALayer(self.channels, 16, param_dtype=pd, name="se")(h)


class AWNet(nn.Module):
    """AWNet baseline (attentive-wavelet UNet, reference `AWNet`
    `LiteISP.py:2221-2319`; its support modules were never shipped, so this
    is a working TPU-native reconstruction). 5 levels (64..1024 ch), GCRDB
    stacks, wavelet down/up, SE gates, 2x PixelShuffle tail -> sRGB."""

    base: int = 64
    blocks: Sequence[int] = (2, 2, 2, 4, 4)
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, raw, cond=None, coord=None, train: bool = False):
        from realcamnet_tpu.ops.blocks import CALayer

        pd = self.param_dtype
        c = self.base
        x = Conv2d(c, 3, 1, 1, param_dtype=pd, name="conv1")(raw)

        skips, dwts = [], []
        for lvl in range(4):
            ch = c * (1 << lvl)
            h = CALayer(ch, 16, param_dtype=pd, name=f"se{lvl + 1}")(x)
            for i in range(self.blocks[lvl]):
                h = GCRDB(ch, param_dtype=pd, name=f"layer{lvl + 1}_b{i}")(h)
            skips.append(ShortcutBlock(ch, pd, name=f"sc{lvl + 1}")(h))
            x, dwt = GCWTResDown(ch, pd, name=f"down{lvl + 1}")(h)
            dwts.append(dwt)

        ch = c * 16
        x = CALayer(ch, 16, param_dtype=pd, name="se5")(x)
        for i in range(self.blocks[4]):
            x = GCRDB(ch, param_dtype=pd, name=f"layer5_b{i}")(x)

        for lvl in range(3, -1, -1):
            ch = c * (1 << lvl)
            x = GCIWTResUp(ch, pd, name=f"up{lvl + 1}")(x, dwts[lvl]) + skips[lvl]

        t = Conv2d(c * 4, 3, 1, 1, param_dtype=pd, name="tail_conv0")(x)
        t = pixel_shuffle(t, 2)
        t = leaky_relu(t, 0.2)
        return Conv2d(3, 3, 1, 1, param_dtype=pd, name="tail_conv1")(t)


class ConditionNet(nn.Module):
    """Legacy FiLM-everywhere net (reference `ConditionNet`,
    `LiteISP.py:165-212` — unrunnable there: it calls `Color_Condition` with
    a keyword that doesn't exist, SURVEY.md §0.1; fixed here). Applies
    scale/shift from a global color vector at three points of a tiny
    1x1-conv net over a 3-ch image."""

    nf: int = 64
    cond_c: int = 3
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, content, cond, train: bool = False):
        pd = self.param_dtype
        vec, _ = ColorCondition(self.cond_c, param_dtype=pd,
                                name="classifier")(cond, train=train)

        def film(x, out_c, tag):
            s = Dense(out_c, pd, name=f"scale_{tag}")(vec)
            t = Dense(out_c, pd, name=f"shift_{tag}")(vec)
            return x * s[:, None, None, :] + t[:, None, None, :] + x

        h = Conv2d(self.nf, 1, 1, 0, param_dtype=pd, name="conv_first")(content)
        h = jax.nn.relu(film(h, self.nf, "first"))
        h = Conv2d(self.nf, 1, 1, 0, param_dtype=pd, name="hr_conv")(h)
        h = jax.nn.relu(film(h, self.nf, "hr"))
        h = Conv2d(3, 1, 1, 0, param_dtype=pd, name="conv_last")(h)
        return film(h, 3, "last")


# --------------------------------------------------------------------------
# Model zoo factories, named after the reference classes.
# --------------------------------------------------------------------------

def lite_isp_net() -> LiteISPNet:
    """`LiteISPNet` baseline (no conditioning), `LiteISP.py:2322-2412`."""
    return LiteISPNet(ch_1=64, use_gfm=False, use_lsc=False)


def lite_isp_net_lsc() -> LiteISPNet:
    """`LiteISPNet_LSC`, `LiteISP.py:1710-1805`."""
    return LiteISPNet(ch_1=48, use_gfm=False, use_lsc=True)


def lite_isp_net_gfm() -> LiteISPNet:
    """`LiteISPNet_GFM` (ch_1=64, cond_c=64), `LiteISP.py:1809-1920`."""
    return LiteISPNet(ch_1=64, cond_c=64, use_gfm=True, use_lsc=False)


def lite_isp_net_gfm_lsc(fused_rcab: bool = False) -> LiteISPNet:
    """Flagship `LiteISPNet_GFM_LSC` (ch_1=48, cond_c=32), `LiteISP.py:1924-2035`."""
    return LiteISPNet(ch_1=48, cond_c=32, use_gfm=True, use_lsc=True,
                      fused_rcab=fused_rcab)


def lite_isp_net_gfm_resize() -> LiteISPNet:
    """`LiteISPNet_GFMresize` (self-conditioned), `LiteISP.py:2414-2520`."""
    return LiteISPNet(ch_1=64, cond_c=32, use_gfm=True, use_lsc=False,
                      self_cond=True, gfm_nf=(128, 256, 256, 512))


def isp_unet_gfm() -> ISPUNet:
    """`ISPUNet_GFM`, `LiteISP.py:963-1110`."""
    return ISPUNet(chan=32, cond_c=32, modulation="gfm", modulation_blocks=2,
                   lsc_mode="none")


def isp_unet_gfm_crop() -> ISPUNet:
    """`ISPUNet_GFM_crop` (self-conditioned, chan=64), `LiteISP.py:811-960`."""
    return ISPUNet(chan=64, cond_c=64, modulation="gfm", modulation_blocks=2,
                   lsc_mode="none", self_cond=True)


def isp_unet_lsc() -> ISPUNet:
    """`ISPUNet_LSC` (LSC only), `LiteISP.py:1113-1225`."""
    return ISPUNet(chan=32, modulation="none", lsc_mode="gain")


def isp_unet_gfm_lsc(cond_c: int = 32, chan: int = 32, m_blocks: int = 2) -> ISPUNet:
    """`ISPUNet_GFM_LSC`, `LiteISP.py:1228-1379`."""
    return ISPUNet(chan=chan, cond_c=cond_c, modulation="gfm",
                   modulation_blocks=m_blocks, lsc_mode="gain")


def isp_unet_gfm_lsc1() -> ISPUNet:
    """`ISPUNet_GFM_LSC1` (coord concatenated into input), `LiteISP.py:1382-1532`."""
    return ISPUNet(chan=32, cond_c=32, modulation="gfm", modulation_blocks=2,
                   lsc_mode="concat")


def isp_unet_gfm_lsc_noskip(cond_c: int = 32, lsc_c: int = 32) -> ISPUNet:
    """`ISPUNet_GFM_LSC_noskip` ablation, `LiteISP.py:2522-2652`."""
    return ISPUNet(chan=32, cond_c=cond_c, modulation="gfm", modulation_blocks=1,
                   lsc_mode="gain", lsc_nf=lsc_c, use_skips=False)


def isp_net_modulation() -> ISPUNet:
    """`ISPNet_modulation` (multi-scale SFT+GFM), `LiteISP.py:662-808`."""
    return ISPUNet(chan=32, cond_c=32, modulation="multiscale",
                   modulation_blocks=2, lsc_mode="none", middle_nb_mult=1)


def isp_unet_gfm_lfm(cond_c: int = 32, n_blocks: int = 2,
                     modulation_blocks: int = 1, chan: int = 32) -> ISPUNet:
    """`ISPUNet_GFM_LFM`, `LiteISP.py:1535-1707`."""
    return ISPUNet(chan=chan, n_blocks=n_blocks, cond_c=cond_c,
                   modulation="gfm_lfm", modulation_blocks=modulation_blocks,
                   lsc_mode="none")


def res_unet() -> ISPUNet:
    """`ResUNet` plain baseline, `LiteISP.py:2038-2146`."""
    return ISPUNet(chan=32, modulation="none", lsc_mode="none")


def isp_net_gfm() -> ISPNetGFM:
    """`ISPNet_gfm` flat model, `LiteISP.py:624-658`."""
    return ISPNetGFM()


def mwisp() -> MWISP:
    """`MWISP` baseline, `LiteISP.py:2149-2218`."""
    return MWISP()


def awnet() -> AWNet:
    """`AWNet` baseline, `LiteISP.py:2221-2319` (working reconstruction)."""
    return AWNet()


ISP_MODELS = {
    "LiteISPNet": lite_isp_net,
    "LiteISPNet_LSC": lite_isp_net_lsc,
    "LiteISPNet_GFM": lite_isp_net_gfm,
    "LiteISPNet_GFM_LSC": lite_isp_net_gfm_lsc,
    "LiteISPNet_GFMresize": lite_isp_net_gfm_resize,
    "ISPUNet_GFM": isp_unet_gfm,
    "ISPUNet_GFM_crop": isp_unet_gfm_crop,
    "ISPUNet_LSC": isp_unet_lsc,
    "ISPUNet_GFM_LSC": isp_unet_gfm_lsc,
    "ISPUNet_GFM_LSC1": isp_unet_gfm_lsc1,
    "ISPUNet_GFM_LSC_noskip": isp_unet_gfm_lsc_noskip,
    "ISPUNet_GFM_LFM": isp_unet_gfm_lfm,
    "ISPNet_modulation": isp_net_modulation,
    "ISPNet_gfm": isp_net_gfm,
    "ResUNet": res_unet,
    "MWISP": mwisp,
    "AWNet": awnet,
}
