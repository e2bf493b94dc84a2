"""Chip diagnostic for the r4 codec fused/bf16 paths.

codec_bench_r04.json showed (a) a NaN in decompress-vs-forward x_hat,
(b) encode time unchanged with fused conv halves despite per-block 1.36x
wins. This script isolates both on hardware:

  leg A: conv3x3_bhcw parity vs XLA at every codec conv-half shape and
         epilogue combo actually used (bf16) — locates shape-specific
         kernel bugs;
  leg B: encode + g_s NaN counts with bf16+fused;
  leg C: encode + g_s timing for {f32, f32+fused, bf16, bf16+fused} —
         decomposes the bf16 and fused contributions e2e.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
  python -u tools/chip_debug_codec_fused.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/codec_fused_debug_r04.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.ops.pallas_conv import _bhcw_ref_conv, conv3x3_bhcw
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.train.checkpoint import latest_checkpoint, restore_params

    log(f"devices: {jax.devices()}")
    results = {}

    # --- leg A: kernel parity at codec shapes ---
    rng = np.random.RandomState(0)
    for (h, w) in ((544, 960), (272, 480), (136, 240)):
        x = jnp.asarray(rng.rand(1, h, 64, w) - 0.5, jnp.bfloat16)
        wk = jnp.asarray(rng.rand(3, 3, 64, 64) - 0.5, jnp.float32) * 0.2
        b = jnp.asarray(rng.rand(64) - 0.5, jnp.float32) * 0.1
        add = jnp.asarray(rng.rand(1, h, 64, w) - 0.5, jnp.bfloat16)
        for tag, kw in (("plain", {}), ("lrelu", {"lrelu": 0.01}),
                        ("lrelu_addpost", {"lrelu": 0.01, "add": add,
                                           "add_post": True}),
                        ("relu", {"relu": True}),
                        ("sums", {"emit_sums": True})):
            f_k = jax.jit(lambda xx, kw=kw: conv3x3_bhcw(xx, wk, b, **kw))
            f_r = jax.jit(lambda xx, kw=kw: _bhcw_ref_conv(xx, wk, b, **kw))
            ok = f_k(x)
            orf = f_r(x)
            outs_k = ok if isinstance(ok, tuple) else (ok,)
            outs_r = orf if isinstance(orf, tuple) else (orf,)
            ds = []
            nn = 0
            for a_, r_ in zip(outs_k, outs_r):
                a_ = np.asarray(a_, np.float32)
                r_ = np.asarray(r_, np.float32)
                nn += int(np.isnan(a_).sum())
                ds.append(float(np.abs(a_ - r_).max()))
            results[f"kern_{h}x{w}_{tag}"] = {"max_diff": max(ds), "nan": nn}
            log(f"kern {h}x{w} {tag}: max_diff {max(ds):.3e} nan {nn}")

    # --- model legs ---
    size = "2160x3840"
    bh, bw = (int(v) for v in size.split("x"))
    h16, w16 = -(-(bh // 2) // 16) * 16, -(-(bw // 2) // 16) * 16
    raw = jnp.full((1, h16, w16, 4), 0.5, jnp.float32)
    cond = raw
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)
    m0 = raw_compression_tcm_final()
    params = jax.jit(m0.init)(jax.random.key(0), raw, cond, coord)
    jax.block_until_ready(params)
    latest = latest_checkpoint("/root/repo/artifacts/ckpt_sweep12k_r03/lmbda_0.013")
    if latest:
        params = restore_params(latest, params)
        log(f"restored {latest}")

    y_shape = (1, h16 // 16, w16 // 16, 320)
    y_fix = jnp.asarray(np.round(rng.randn(*y_shape) * 3), jnp.float32)

    def timed(fn, n=5):
        _ = float(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn()
        _ = float(s)
        return (time.perf_counter() - t0) / n * 1e3

    for name, kw in (("f32", {}), ("f32_fused", {"fused_conv": True}),
                     ("bf16", {"compute_dtype": jnp.bfloat16}),
                     ("bf16_fused", {"compute_dtype": jnp.bfloat16,
                                     "fused_conv": True})):
        m = raw_compression_tcm_final(**kw)
        enc = jax.jit(lambda p, r, c, k, m=m: m.apply(
            p, r, c, k, method="encode_with_aux")[0])
        gs = jax.jit(lambda p, yy, m=m: m.apply(p, yy, method="g_s"))
        log(f"compile encode {name}")
        y = enc(params, raw, cond, coord)
        ynan = int(jnp.isnan(y.astype(jnp.float32)).sum())
        enc_ms = timed(lambda: enc(params, raw, cond, coord)
                       .astype(jnp.float32).sum())
        log(f"compile g_s {name}")
        x = gs(params, y_fix)
        xnan = int(jnp.isnan(x.astype(jnp.float32)).sum())
        gs_ms = timed(lambda: gs(params, y_fix).astype(jnp.float32).sum())
        results[f"model_{name}"] = {"enc_ms": round(enc_ms, 2),
                                    "gs_ms": round(gs_ms, 2),
                                    "y_nan": ynan, "gs_nan": xnan}
        log(f"{name}: encode {enc_ms:.1f} ms (y_nan {ynan}), "
            f"g_s {gs_ms:.1f} ms (x_nan {xnan})")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
