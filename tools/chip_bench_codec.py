"""Joint-codec throughput at 4K on one chip (VERDICT r2 missing #2).

Times the model the paper is named for — `raw_compression_tcm_final`
(reference `raw2bit.py:1614-2027`) — end to end at 4K:

  (a) training-path forward (eval mode, likelihood estimate),
  (b) `compress()`  — device transforms + ChARM encode pass + host rANS,
  (c) `decompress()` — z decode, h_synth, the 5 serial device<->host
      round trips (`raw2bit.py:1982-2025` semantics), g_s synthesis,

with a per-stage breakdown so the top cost is identifiable. Timing blocks on
value-dependent scalars (relay backend under-reports otherwise); host phases
are wall-clock around the blocking calls.

Writes artifacts/codec_bench_r03.json. Set RCN_PALLAS_WMSA=1 to bench the
Pallas window-attention path; BENCH_SIZE=HxW to change the frame.

Usage: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
  timeout 1500 python -u tools/chip_bench_codec.py
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

OUT = os.environ.get("CODEC_BENCH_OUT", "/root/repo/artifacts/codec_bench_r03.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.entropy import coder as rans
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final

    log(f"devices: {jax.devices()} pallas_wmsa={os.environ.get('RCN_PALLAS_WMSA','0')}")
    size = os.environ.get("BENCH_SIZE", "2160x3840")
    bh, bw = (int(v) for v in size.split("x"))
    h, w = bh // 2, bw // 2
    h16, w16 = -(-h // 16) * 16, -(-w // 16) * 16
    model = raw_compression_tcm_final()

    raw = jnp.ones((1, h16, w16, 4), jnp.float32) * 0.5
    cond = raw
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)

    log(f"jit init (packed {h16}x{w16})")
    params = jax.jit(model.init)(jax.random.key(0), raw, cond, coord)
    jax.block_until_ready(params)

    # Prefer the best-trained checkpoint for realistic symbol statistics.
    try:
        from realcamnet_tpu.train.checkpoint import latest_checkpoint, restore_params

        latest = None
        for ckpt in ("/root/repo/artifacts/ckpt_long_r03/lmbda_0.013",
                     "/root/repo/artifacts/ckpt_rd_r02"):
            latest = latest_checkpoint(ckpt)
            if latest:
                break
        if latest:
            params = restore_params(latest, params)
            log(f"restored {latest}")
    except Exception as e:  # random init is fine for timing
        log(f"checkpoint restore skipped: {e}")

    results = {"frame": size, "packed": f"{h16}x{w16}",
               "pallas_wmsa": os.environ.get("RCN_PALLAS_WMSA", "0")}

    # (a) training-path forward (eval mode). SKIP_FWD=1 skips it (its 4K
    # compile alone is ~12 min through the relay) for codec-only reruns.
    if os.environ.get("SKIP_FWD", "0") != "1":
        @jax.jit
        def fwd(p, r, c, k):
            out = model.apply(p, r, c, k)
            return (out["x_hat"].astype(jnp.float32).sum()
                    + sum(jnp.log(l).sum() for l in out["likelihoods"].values()))

        log("compile forward")
        s = fwd(params, raw, cond, coord)
        _ = float(s)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fwd(params, raw, cond, coord)
        _ = float(s)
        fwd_ms = (time.perf_counter() - t0) / iters * 1e3
        results["forward_ms"] = round(fwd_ms, 2)
        results["forward_fps"] = round(1e3 / fwd_ms, 3)
        log(f"forward: {fwd_ms:.1f} ms ({1e3/fwd_ms:.2f} fps)")

    # (b) compress, with breakdown.
    codec = ChARMCodec(model, params)
    t0 = time.perf_counter()
    codec.update()
    results["update_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    enc = jax.jit(lambda p, r, c, k: model.apply(p, r, c, k, method="encode"))
    log("compile encode")
    y, z = enc(params, raw, cond, coord)
    jax.block_until_ready((y, z))

    def timed(fn, n=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        return (time.perf_counter() - t0) / n * 1e3, out

    # encode (g_a + h_a) device time via checksum program
    enc_sum = jax.jit(lambda p, r, c, k: sum(
        t.astype(jnp.float32).sum() for t in model.apply(p, r, c, k, method="encode")))
    ms, _ = timed(lambda: float(enc_sum(params, raw, cond, coord)))
    results["encode_device_ms"] = round(ms, 2)
    log(f"encode(y,z): {ms:.1f} ms")

    z_np = np.asarray(jax.device_get(z))
    ms, z_str = timed(lambda: codec.compress_z(z_np))
    results["z_rans_enc_ms"] = round(ms, 2)
    ms, z_hat_np = timed(lambda: codec.decompress_z(z_str, z_np.shape[1:3], z_np.shape[-1]))
    results["z_rans_dec_ms"] = round(ms, 2)
    z_hat = jnp.asarray(z_hat_np)

    hs_sum = jax.jit(lambda p, zz: sum(
        t.astype(jnp.float32).sum() for t in model.apply(p, zz, method="h_synth")))
    _ = float(hs_sum(params, z_hat))
    ms, _ = timed(lambda: float(hs_sum(params, z_hat)))
    results["h_synth_ms"] = round(ms, 2)
    latent_means, latent_scales = codec._h_synth(params, z_hat)
    jax.block_until_ready((latent_means, latent_scales))

    # ChARM encode-side device pass (one program, 5 slices)
    if not hasattr(codec, "_compress_device_jit"):
        codec._compress_device_jit = jax.jit(codec._compress_device)
    log("compile charm encode pass")
    syms, _s8, _maxabs, scales = codec._compress_device_jit(params, y, latent_means, latent_scales)
    jax.block_until_ready((syms, scales))

    def charm_pass():
        s2, _s82, _m2, i2 = codec._compress_device_jit(params, y, latent_means, latent_scales)
        # uint8 table indexes come back from the device (r3 optimization).
        return np.asarray(jax.device_get(s2)), np.asarray(jax.device_get(i2))

    ms, (syms_np, idx_np) = timed(charm_pass)
    results["charm_encode_device_ms"] = round(ms, 2)
    log(f"charm encode pass: {ms:.1f} ms")

    idx = idx_np.astype(np.int32)
    ms, y_str = timed(lambda: rans.encode_with_indexes(
        syms_np.reshape(-1), idx.reshape(-1), codec.gauss.cdfs,
        codec.gauss.cdf_lengths, codec.gauss.offsets))
    results["y_rans_enc_ms"] = round(ms, 2)
    results["y_bytes"] = len(y_str)
    results["z_bytes"] = len(z_str)
    results["bpp_real"] = round((len(y_str) + len(z_str)) * 8.0 / (bh * bw), 5)

    # total compress wall time (end to end through the public API)
    ms, out = timed(lambda: codec.compress(raw, cond, coord), n=3)
    results["compress_total_ms"] = round(ms, 2)
    log(f"compress total: {ms:.1f} ms")

    # (c) decompress, with breakdown.
    log("compile decompress path")
    t0 = time.perf_counter()
    dec = codec.decompress(out["strings"], out["shape"])
    jax.block_until_ready(dec["x_hat"])
    log(f"decompress compile+run: {time.perf_counter()-t0:.1f}s")

    ms, _ = timed(lambda: jax.block_until_ready(
        codec.decompress(out["strings"], out["shape"])["x_hat"]), n=3)
    results["decompress_total_ms"] = round(ms, 2)
    log(f"decompress total: {ms:.1f} ms")

    # per-phase: y slice loop vs g_s
    y_shape = (out["shape"][0] * 4, out["shape"][1] * 4)
    t0 = time.perf_counter()
    y_hat = codec.decompress_y(out["strings"][0][0], latent_means,
                               latent_scales, y_shape)
    jax.block_until_ready(y_hat)
    results["y_decode_loop_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    gs_sum = jax.jit(lambda p, yh: model.apply(p, yh, method="g_s").astype(jnp.float32).sum())
    _ = float(gs_sum(params, y_hat))
    ms, _ = timed(lambda: float(gs_sum(params, y_hat)))
    results["g_s_ms"] = round(ms, 2)
    log(f"y decode loop: {results['y_decode_loop_ms']} ms, g_s: {ms:.1f} ms")

    os.makedirs("/root/repo/artifacts", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}: {json.dumps(results)}")


if __name__ == "__main__":
    main()
