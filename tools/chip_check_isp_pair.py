"""Chip check: paired-RCAB ISP trunk at 4K vs the per-conv fused trunk.

The pair kernel keeps each RCAB's mid activation in VMEM (one full-res
write+read removed per RCAB); projected ~20-25% off the 112 ms fused
frame (roofline_r03.json). Parity + timing, bf16.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
  python -u tools/chip_check_isp_pair.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/isp_pair_check_r04.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc

    log(f"devices: {jax.devices()}")
    h16, w16 = 1088, 1920
    results = {}
    raw = jnp.ones((1, h16, w16, 4), jnp.bfloat16)
    cond = jnp.ones((1, h16, w16, 4), jnp.bfloat16)
    coord = jnp.ones((1, h16, w16, 2), jnp.bfloat16)
    m0 = lite_isp_net_gfm_lsc()
    params = jax.jit(m0.init)(jax.random.key(0), raw.astype(jnp.float32),
                              cond.astype(jnp.float32),
                              coord.astype(jnp.float32))
    jax.block_until_ready(params)

    def timed(tag, model, n=20):
        jf = jax.jit(lambda p, r, c, k: (
            model.apply(p, r, c, k).astype(jnp.float32).sum()))
        t0 = time.perf_counter()
        s0 = float(jf(params, raw, cond, coord))
        ct = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            s = jf(params, raw, cond, coord)
        _ = float(s)
        ms = (time.perf_counter() - t0) / n * 1e3
        results[tag] = {"ms": round(ms, 2), "fps": round(1e3 / ms, 2),
                        "sum": s0}
        log(f"{tag}: {ms:.2f} ms ({1e3/ms:.2f} fps, compile {ct:.0f}s)")
        return s0

    s_f = timed("fused_per_conv", lite_isp_net_gfm_lsc(fused_rcab=True))
    s_p = timed("fused_pair", lite_isp_net_gfm_lsc(fused_rcab="pair"))
    rel = abs(s_f - s_p) / max(abs(s_f), 1e-6)
    results["sum_rel_diff"] = rel
    log(f"parity: sum rel diff {rel:.2e}")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
