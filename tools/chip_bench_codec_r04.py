"""Round-4 joint-codec 4K bench: fused BHCW conv halves + bf16 transforms
+ the fused decode pipeline (VERDICT r3 next #1/#6/#7a).

Measures, on one chip at 4K, for `raw_compression_tcm_final(fused_conv=True,
compute_dtype=bf16)` with the converged 12k-step checkpoint:
  (a) training-path forward (eval mode) — target: measurably < the 322 ms
      f32 XLA baseline (codec_bench_r03.json); per-block fused-vs-plain
      evidence at matched dtype: codec_fused_block_check_r04.json,
  (b) compress() breakdown (update x2 to expose the r3 first-call anomaly),
  (c) decompress() with the r4 fused pipeline (num_slices+1 dispatches,
      h_synth in the first program, g_s in the last) — target < 400 ms,
  (d) decompress∘compress vs eval-forward x_hat consistency.

Env: BENCH_SIZE=HxW, CODEC_FUSED=0/1, CODEC_BF16=0/1, SKIP_FWD=1.

Usage: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
  timeout 3500 python -u tools/chip_bench_codec_r04.py
(one TPU process at a time)
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = os.environ.get("CODEC_BENCH_OUT",
                     "/root/repo/artifacts/codec_bench_r04.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.entropy import coder as rans
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final

    fused = os.environ.get("CODEC_FUSED", "1") == "1"
    bf16 = os.environ.get("CODEC_BF16", "1") == "1"
    wmsa = os.environ.get("CODEC_WMSA", "2")
    if wmsa != "0":
        from realcamnet_tpu.ops.attention.wmsa import set_wmsa_pallas

        set_wmsa_pallas("v2" if wmsa == "2" else True)
    log(f"devices: {jax.devices()} fused={fused} bf16={bf16} wmsa={wmsa}")
    size = os.environ.get("BENCH_SIZE", "2160x3840")
    bh, bw = (int(v) for v in size.split("x"))
    h, w = bh // 2, bw // 2
    h16, w16 = -(-h // 16) * 16, -(-w // 16) * 16
    model = raw_compression_tcm_final(
        fused_conv=fused,
        compute_dtype=jnp.bfloat16 if bf16 else None)

    raw = jnp.ones((1, h16, w16, 4), jnp.float32) * 0.5
    cond = raw
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)

    log(f"jit init (packed {h16}x{w16})")
    params = jax.jit(model.init)(jax.random.key(0), raw, cond, coord)
    jax.block_until_ready(params)

    try:
        from realcamnet_tpu.train.checkpoint import latest_checkpoint, restore_params

        latest = None
        for ckpt in ("/root/repo/artifacts/ckpt_sweep12k_r03/lmbda_0.013",
                     "/root/repo/artifacts/ckpt_long_r03/lmbda_0.013"):
            latest = latest_checkpoint(ckpt)
            if latest:
                break
        if latest:
            params = restore_params(latest, params)
            log(f"restored {latest}")
    except Exception as e:
        log(f"checkpoint restore skipped: {e}")

    results = {"frame": size, "packed": f"{h16}x{w16}", "fused_conv": fused,
               "bf16": bf16, "pallas_wmsa": wmsa,
               "baseline_r03_f32_forward_ms": 321.89,
               "baseline_r03_compress_ms": 625.1,
               "baseline_r03_decompress_ms": 555.31}

    # Relay transfer bandwidth probe: the codec's host<->device traffic
    # (symbol pulls/pushes) is a fixed cost through the relay; record the
    # measured bandwidth so the breakdown is interpretable. Probe twice —
    # the first transfer after process start can be pathologically slow.
    big = jax.jit(lambda k: (jax.random.uniform(k, (4 * 1024 * 1024,))
                             * 100).astype(jnp.int16))(jax.random.key(0))
    jax.block_until_ready(big)
    for attempt in ("first", "second"):
        t0 = time.perf_counter()
        _ = np.asarray(jax.device_get(big))
        results[f"pull_8mb_ms_{attempt}"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(np.ones((4 * 1024 * 1024,), np.int16)))
    results["push_8mb_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    log(f"transfer probe: pull 8MB {results['pull_8mb_ms_first']} / "
        f"{results['pull_8mb_ms_second']} ms, "
        f"push 8MB {results['push_8mb_ms']} ms")

    x_hat_fwd = None
    if os.environ.get("SKIP_FWD", "0") != "1":
        @jax.jit
        def fwd(p, r, c, k):
            out = model.apply(p, r, c, k)
            s = (out["x_hat"].astype(jnp.float32).sum()
                 + sum(jnp.log(l.astype(jnp.float32)).sum()
                       for l in out["likelihoods"].values()))
            return out["x_hat"], s

        log("compile forward")
        t0 = time.perf_counter()
        x_hat_fwd, s = fwd(params, raw, cond, coord)
        _ = float(s)
        results["forward_compile_s"] = round(time.perf_counter() - t0, 1)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            x_hat_fwd, s = fwd(params, raw, cond, coord)
        _ = float(s)
        fwd_ms = (time.perf_counter() - t0) / iters * 1e3
        results["forward_ms"] = round(fwd_ms, 2)
        results["forward_fps"] = round(1e3 / fwd_ms, 3)
        log(f"forward: {fwd_ms:.1f} ms ({1e3/fwd_ms:.2f} fps) "
            f"vs r3 f32 321.9 ms")

    codec = ChARMCodec(model, params)
    # update() twice: r3's decode-opt artifact recorded 56.8 s for the first
    # update in a fresh process — expose first-op relay warmup + _eb_pmf
    # compile vs the steady-state cost.
    t0 = time.perf_counter()
    codec.update()
    results["update_first_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    t0 = time.perf_counter()
    codec.update()
    results["update_second_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    log(f"update: first {results['update_first_ms']} ms, "
        f"second {results['update_second_ms']} ms")

    enc_sum = jax.jit(lambda p, r, c, k: sum(
        t.astype(jnp.float32).sum()
        for t in model.apply(p, r, c, k, method="encode")))
    log("compile encode")
    _ = float(enc_sum(params, raw, cond, coord))

    def timed(fn, n=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        return (time.perf_counter() - t0) / n * 1e3, out

    ms, _ = timed(lambda: float(enc_sum(params, raw, cond, coord)))
    results["encode_device_ms"] = round(ms, 2)
    log(f"encode(y,z): {ms:.1f} ms (r3 f32: 198.6)")

    log("compile compress path")
    t0 = time.perf_counter()
    out = codec.compress(raw, cond, coord)
    results["compress_compile_s"] = round(time.perf_counter() - t0, 1)
    ms, out = timed(lambda: codec.compress(raw, cond, coord), n=3)
    results["compress_total_ms"] = round(ms, 2)
    nbytes = sum(len(s[0]) for s in out["strings"])
    results["y_bytes"] = len(out["strings"][0][0])
    results["z_bytes"] = len(out["strings"][1][0])
    results["bpp_real"] = round(nbytes * 8.0 / (bh * bw), 5)
    log(f"compress total: {ms:.1f} ms, bpp {results['bpp_real']} "
        f"(r3 f32: 625.1 ms, bpp 0.14831)")

    log("compile decompress pipeline")
    t0 = time.perf_counter()
    dec = codec.decompress(out["strings"], out["shape"])
    jax.block_until_ready(dec["x_hat"])
    results["decompress_compile_s"] = round(time.perf_counter() - t0, 1)
    ms, dec = timed(lambda: codec.decompress(out["strings"], out["shape"]),
                    n=3)
    jax.block_until_ready(dec["x_hat"])
    # timed's inner lambda returns after x_hat is materialized by
    # block_until_ready below; re-time with explicit blocking:

    def dec_once():
        d = codec.decompress(out["strings"], out["shape"])
        return float(d["x_hat"].astype(jnp.float32).sum())

    ms, _ = timed(dec_once, n=3)
    results["decompress_total_ms"] = round(ms, 2)
    log(f"decompress total: {ms:.1f} ms (r3 f32: 555.3 ms; target <400)")

    if x_hat_fwd is not None:
        diff = jax.jit(lambda a, b: jnp.abs(
            a.astype(jnp.float32) - jnp.clip(b.astype(jnp.float32), 0, 1)
        ).max())(dec["x_hat"], x_hat_fwd)
        results["max_dec_vs_fwd"] = float(diff)
        log(f"max|decompress - clip(forward)| = {results['max_dec_vs_fwd']}")

    os.makedirs("/root/repo/artifacts", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}: {json.dumps(results)}")


if __name__ == "__main__":
    main()
