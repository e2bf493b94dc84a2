"""Fine-grained nested-prefix profile of the g_s decoder tail at 4K.

The r5 coarse profile (codec_stage_profile_r05_fused.json) read the
m_up2+up2 stage at 66.7 ms marginal vs 5.2 ms for m_up1+up1 — 13x the
time for 4x the pixels, which smells like relay noise or a layout
pathology at a specific boundary. This measures one prefix per SEGMENT
(stem / m_up1 / up1 / m_up2 / up2 / m_up3 / up3 / tail_block / tail_out)
with median-of-5 groups, deltas = marginal segment cost in fusion
context (block-isolated numbers mislead — r4 lesson).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
  python -u tools/chip_gs_fine_profile.py
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/gs_fine_profile_r05.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.ops.attention.wmsa import set_wmsa_pallas
    from realcamnet_tpu.train.checkpoint import (latest_checkpoint,
                                                 restore_params)

    log(f"devices: {jax.devices()}")
    set_wmsa_pallas("v2")
    model = raw_compression_tcm_final(fused_conv=True,
                                      compute_dtype=jnp.bfloat16)
    h16, w16 = 1088, 1920
    raw = jnp.full((1, h16, w16, 4), 0.5, jnp.float32)
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), raw, raw, coord)
    jax.block_until_ready(params)
    ckpt = latest_checkpoint(
        "/root/repo/artifacts/ckpt_sweep_cam_r05/lmbda_0.013")
    params = restore_params(ckpt, params)
    log(f"restored {ckpt}")

    y = jnp.zeros((1, 68, 120, 320), jnp.float32)
    results = {"frame": "2160x3840 (packed 1088x1920)",
               "stack": "fused BHCW + WMSA-v2 + bf16"}

    SEGS = ["gs_stem", "m_up1", "up1", "m_up2", "up2", "m_up3", "up3",
            "tail_block", "tail_out"]

    def gs_upto(depth):
        def f(mm, yy):
            h = mm.gs_stem(mm._cd(yy))
            seq = [("m_up1", mm.m_up1), ("up1", mm.up1),
                   ("m_up2", mm.m_up2), ("up2", mm.up2),
                   ("m_up3", mm.m_up3), ("up3", mm.up3),
                   ("tail_block", mm.tail_block), ("tail_out", mm.tail_out)]
            for k, (name, mod) in enumerate(seq, start=1):
                if k > depth:
                    break
                if isinstance(mod, (list, tuple)):
                    for blk in mod:
                        h = blk(h)
                else:
                    h = mod(h)
            return h
        return lambda p: model.apply(p, y, method=lambda mm, yy: f(mm, yy)
                                     ).astype(jnp.float32).sum()

    def timed(tag, fn):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        _ = float(jf(params))
        ct = time.perf_counter() - t0
        _ = float(jf(params))  # extra warm: post-compile relay noise
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                s = jf(params)
            _ = float(s)
            samples.append((time.perf_counter() - t0) / 3 * 1e3)
        samples.sort()
        med = samples[2]
        results[tag] = {"ms": round(med, 2),
                        "spread": round(samples[-1] - samples[0], 2)}
        log(f"{tag}: {med:.2f} ms (spread {samples[-1]-samples[0]:.2f}, "
            f"compile {ct:.0f}s)")
        return med

    prev = 0.0
    marginals = {}
    for d in range(len(SEGS)):
        m = timed(f"prefix_{d}_{SEGS[d]}", gs_upto(d))
        marginals[SEGS[d]] = round(m - prev, 2)
        prev = m
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    results["marginal_ms"] = marginals
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"marginals: {marginals}")
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
