"""Per-stage chip profile of the joint-codec forward at 4K (r4).

The e2e encode/g_s times are flat across {f32, bf16} x {fused, plain}
(codec_fused_debug_r04.json) even though isolated hybrid blocks show 1.36x
fused wins — so the block-isolated numbers are misleading and the real time
must live elsewhere. This measures MARGINAL stage costs by timing nested
prefixes of the encoder/decoder, plus the aux modules (LFT, GFT, h_a,
charm estimate) and a NaN probe on the charm leg.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
  python -u tools/chip_profile_codec_stages.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os

# RCN_PROFILE_FUSED=1: profile the full fused stack (BHCW conv halves +
# WMSA-v2 + bf16) instead of plain bf16 — post-fusion marginals for the
# decoder-tail question (VERDICT r4 next #4).
FUSED = os.environ.get("RCN_PROFILE_FUSED", "0") == "1"
OUT = ("/root/repo/artifacts/codec_stage_profile_r05_fused.json" if FUSED
       else "/root/repo/artifacts/codec_stage_profile_r04.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.train.checkpoint import latest_checkpoint, restore_params

    log(f"devices: {jax.devices()}")
    h16, w16 = 1088, 1920
    if FUSED:
        from realcamnet_tpu.ops.attention.wmsa import set_wmsa_pallas

        set_wmsa_pallas("v2")
        model = raw_compression_tcm_final(fused_conv=True,
                                          compute_dtype=jnp.bfloat16)
    else:
        model = raw_compression_tcm_final(compute_dtype=jnp.bfloat16)
    raw = jnp.full((1, h16, w16, 4), 0.5, jnp.float32)
    cond = raw
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), raw, cond, coord)
    jax.block_until_ready(params)
    latest = (latest_checkpoint(
        "/root/repo/artifacts/ckpt_sweep_cam_r05/lmbda_0.013") or
        latest_checkpoint(
        "/root/repo/artifacts/ckpt_sweep12k_r03/lmbda_0.013"))
    params = restore_params(latest, params)
    log(f"restored {latest}")

    results = {}

    def timed(tag, fn, n=5):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        _ = float(jf(params))
        ct = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            s = jf(params)
        _ = float(s)
        ms = (time.perf_counter() - t0) / n * 1e3
        results[tag] = round(ms, 2)
        log(f"{tag}: {ms:.1f} ms (compile {ct:.0f}s)")
        return ms

    def enc_prefix(m, depth):
        """encode_with_aux truncated after `depth` stages:
        0=cond/lft/stem only, 1=+m_down1+down1, 2=+m_down2+down2, 3=full."""
        from realcamnet_tpu.models.raw2bit import ConvTransBlockMzj

        def f(mm, r, c, k):
            r, c, k = mm._cd(r), mm._cd(c), mm._cd(k)
            aux_vec = mm.classifier(c) if mm.use_gft else None
            lft = mm.local_condition(r) if mm.use_lft else None
            fea = mm.conv_first(r)
            lsc = mm.lsc(k)
            fea = fea * (lsc + 1)
            fea = mm.conv_down(fea)
            stages = ((mm.m_down1, mm.down1, 0), (mm.m_down2, mm.down2, 1),
                      (mm.m_down3, mm.down3, 2))
            for si, (blocks, down, kk) in enumerate(stages):
                if si >= depth:
                    break
                if mm.use_gft:
                    fea = mm.gfms[kk](fea, aux_vec)
                for blk in blocks:
                    if isinstance(blk, ConvTransBlockMzj):
                        fea = blk(fea, lft[kk])
                    else:
                        fea = blk(fea)
                fea = down(fea)
            return fea
        return lambda p: model.apply(p, raw, cond, coord, method=f
                                     ).astype(jnp.float32).sum()

    # Aux modules alone.
    timed("gft_classifier", lambda p: model.apply(
        p, cond, method=lambda m, c: m.classifier(m._cd(c))).astype(jnp.float32).sum())
    timed("lft_local_condition", lambda p: sum(
        t.astype(jnp.float32).sum() for t in model.apply(
            p, raw, method=lambda m, r: m.local_condition(m._cd(r)))))

    # Encoder prefixes (marginal = difference of successive rows).
    for d in range(4):
        timed(f"enc_prefix_{d}", enc_prefix(model, d))

    # h_a on a fixed y.
    y = jnp.zeros((1, 68, 120, 320), jnp.bfloat16)
    timed("h_a", lambda p: model.apply(p, y, method="h_a")
          .astype(jnp.float32).sum())
    z = jnp.zeros((1, 17, 30, 192), jnp.float32)
    timed("h_synth", lambda p: sum(t.astype(jnp.float32).sum()
                                   for t in model.apply(p, z, method="h_synth")))

    # ChARM estimate + NaN probe.
    ms_ = jnp.zeros((1, 68, 120, 320), jnp.bfloat16)

    def charm_leg(p):
        yh, lik, mu, sc = model.apply(p, y, ms_, ms_,
                                      method=lambda m, a, b, c: m.charm(a, b, c))
        return (yh.astype(jnp.float32).sum()
                + jnp.isnan(lik.astype(jnp.float32)).sum()
                + jnp.isnan(yh.astype(jnp.float32)).sum() * 1e6)

    timed("charm_estimate", charm_leg)

    # Decoder prefixes.
    def gs_prefix(depth):
        def f(mm, yy):
            hh = mm.gs_stem(mm._cd(yy))
            ups = ((mm.m_up1, mm.up1), (mm.m_up2, mm.up2))
            for si, (blocks, up) in enumerate(ups):
                if si >= depth:
                    return hh
                for blk in blocks:
                    hh = blk(hh)
                hh = up(hh)
            if depth < 3:
                return hh
            for blk in mm.m_up3:
                hh = blk(hh)
            hh = mm.up3(hh)
            hh = mm.tail_block(hh)
            return mm.tail_out(hh)
        return lambda p: model.apply(p, y, method=lambda mm, yy: f(mm, yy)
                                     ).astype(jnp.float32).sum()

    for d in (0, 1, 2, 3):
        timed(f"gs_prefix_{d}", gs_prefix(d))

    # Full-forward NaN probe (big compile): where does the bench NaN live?
    def full_nan(p):
        out = model.apply(p, raw, cond, coord)
        return (jnp.isnan(out["x_hat"].astype(jnp.float32)).sum()
                + 1e3 * jnp.isnan(out["likelihoods"]["y"]
                                  .astype(jnp.float32)).sum()
                + 1e6 * jnp.isnan(out["likelihoods"]["z"]
                                  .astype(jnp.float32)).sum())

    jf = jax.jit(full_nan)
    log("compile full forward nan probe")
    v = float(jf(params))
    results["full_forward_nan_code"] = v
    log(f"full forward nan code (xhat + 1e3*liky + 1e6*likz): {v}")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
