"""Analytic per-stage cost breakdown of the flagship joint codec at 4K.

XLA cost analysis (bytes accessed / FLOPs) of each stage of
`raw_compression_tcm_final` at the 4K packed shape, on the CPU backend —
a structural proxy for where the 322 ms chip forward (codec_bench_r03.json)
goes, used to target the round-4 Pallas/bf16 work (VERDICT r3 next #1).

Per-stage shapes (packed Bayer 1088x1920):
  stem      1088x1920 x4 -> 544x960 x128
  m_down1   544x960 x128 (2 CIMC blocks: conv half 64ch + swin half 64ch)
  m_down2   272x480 x128, m_down3 136x240 x128, down3 -> 68x120 x320
  g_s       mirror decoder at the same resolutions

Usage: JAX_PLATFORMS=cpu python tools/codec_cost_breakdown.py [HxW]
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
from realcamnet_tpu.utils.profiling import cost_analysis


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "2160x3840"
    bh, bw = (int(v) for v in size.split("x"))
    h, w = bh // 2, bw // 2
    h16, w16 = -(-h // 16) * 16, -(-w // 16) * 16
    model = raw_compression_tcm_final()
    raw = jnp.zeros((1, h16, w16, 4), jnp.float32)
    cond = raw
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.key(0), raw, cond, coord)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    rows = {}

    def add(name, fn, *args):
        c = cost_analysis(fn, *args)
        rows[name] = {"gb": round(c["bytes_accessed"] / 1e9, 2),
                      "gflop": round(c["flops"] / 1e9, 1)}
        print(f"{name:28s} {rows[name]['gb']:8.2f} GB {rows[name]['gflop']:10.1f} GFLOP",
              flush=True)

    # Full legs.
    add("encode(g_a+h_a)", lambda p, r, c, k: model.apply(
        p, r, c, k, method="encode"), params, raw, cond, coord)
    y = jnp.zeros((1, h16 // 16, w16 // 16, model.m), jnp.float32)
    add("g_s", lambda p, yy: model.apply(p, yy, method="g_s"), params, y)
    z = jnp.zeros((1, h16 // 64, w16 // 64, 192), jnp.float32)
    add("h_synth", lambda p, zz: model.apply(p, zz, method="h_synth"), params, z)

    def charm(p, yy, m_, s_):
        return model.apply(p, yy, m_, s_,
                           method=lambda m, *a: m.charm(*a))

    ms = jnp.zeros((1, h16 // 16, w16 // 16, model.m), jnp.float32)
    add("charm(estimate)", charm, params, y, ms, ms)

    # Encoder internals, one representative block per scale.
    from realcamnet_tpu.models.raw2bit import ConvTransBlockMzj, ResidualBlockWithCA
    from realcamnet_tpu.ops.attention.wmsa import SwinTransformerBlock
    from realcamnet_tpu.ops.blocks import Conv2d
    from realcamnet_tpu.ops.codec_layers import ResidualBlockWithStride

    def block_cost(name, mod, *xs):
        p = jax.eval_shape(mod.init, jax.random.key(0), *xs)
        p = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p)
        add(name, lambda pp, *aa: mod.apply(pp, *aa), p, *xs)

    x1 = jnp.zeros((1, h16 // 2, w16 // 2, 128), jnp.float32)
    lft1 = jnp.zeros((1, h16 // 2, w16 // 2, 64), jnp.float32)
    block_cost("stem conv_first(4->128)", Conv2d(128, 3, 1, 1), raw)
    block_cost("stem conv_down(/2)", ResidualBlockWithStride(128, 2), x1)
    block_cost("cimc_block@s1(544x960)", ConvTransBlockMzj(64, 64, 8, 8), x1, lft1)
    x64 = jnp.zeros((1, h16 // 2, w16 // 2, 64), jnp.float32)
    block_cost("  conv_half RBWithCA@s1", ResidualBlockWithCA(64), x64)
    block_cost("  swin_half@s1", SwinTransformerBlock(64, 8, 8, False), x64)
    block_cost("  1x1 128->128@s1", Conv2d(128, 1, 1, 0), x1)
    x2 = jnp.zeros((1, h16 // 4, w16 // 4, 128), jnp.float32)
    lft2 = jnp.zeros((1, h16 // 4, w16 // 4, 64), jnp.float32)
    block_cost("cimc_block@s2(272x480)", ConvTransBlockMzj(64, 64, 16, 8), x2, lft2)
    x3 = jnp.zeros((1, h16 // 8, w16 // 8, 128), jnp.float32)
    lft3 = jnp.zeros((1, h16 // 8, w16 // 8, 64), jnp.float32)
    block_cost("cimc_block@s3(136x240)", ConvTransBlockMzj(64, 64, 32, 8), x3, lft3)

    # Decoder internals.
    from realcamnet_tpu.models.tcm import ConvTransBlock
    from realcamnet_tpu.ops.codec_layers import (ResidualBlock,
                                                 ResidualBlockUpsample,
                                                 SubpelConv3x3)

    y320 = jnp.zeros((1, h16 // 16, w16 // 16, 320), jnp.float32)
    block_cost("gs_stem RBU(320->128)", ResidualBlockUpsample(128, 2), y320)
    xs1 = jnp.zeros((1, h16 // 8, w16 // 8, 128), jnp.float32)
    block_cost("dec ctb@(136x240)", ConvTransBlock(64, 64, 32, 8), xs1)
    xs2 = jnp.zeros((1, h16 // 4, w16 // 4, 128), jnp.float32)
    block_cost("dec ctb@(272x480)", ConvTransBlock(64, 64, 16, 8), xs2)
    xs3 = jnp.zeros((1, h16 // 2, w16 // 2, 128), jnp.float32)
    block_cost("dec ctb@(544x960)", ConvTransBlock(64, 64, 8, 8), xs3)
    block_cost("dec up3 subpel(128)", SubpelConv3x3(128, 2), xs3)
    xfull = jnp.zeros((1, h16, w16, 128), jnp.float32)
    block_cost("dec tail RB(128)@1088", ResidualBlock(128), xfull)
    block_cost("dec tail_out subpel(3)", SubpelConv3x3(3, 2), xfull)

    out = "/root/repo/artifacts/codec_cost_breakdown_r04.json"
    with open(out, "w") as f:
        json.dump({"frame": size, "dtype": "float32", "backend": "cpu",
                   "stages": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
