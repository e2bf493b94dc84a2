"""Benchmark harness: flagship ISP + joint codec 4K throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "codec"}.
The headline metric is the flagship ISP RAW->sRGB frames/sec/chip at 4K; the
"codec" sub-object covers the full RAW->bitstream->sRGB pipeline the
north-star describes (`raw_compression_tcm_final`, reference
`raw2bit.py:1614-2027`): eval-forward fps plus compress()/decompress() wall
times through the real C++ rANS bitstream. The reference publishes no
throughput numbers (BASELINE.md), so vs_baseline is null.

Env: BENCH_SIZE=HxW (Bayer mosaic size), BENCH_CODEC=0 to skip the codec leg
(its 4K compiles take ~15 min through remote-dispatch backends).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: remote compiles of the big graphs are slow;
# cache keyed on HLO makes reruns near-instant.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc

    log(f"devices: {jax.devices()}")
    size = os.environ.get("BENCH_SIZE", "2160x3840")  # 4K Bayer mosaic
    bh, bw = (int(v) for v in size.split("x"))
    # Packed Bayer: (H/2, W/2, 4), padded to /16 multiples.
    h, w = bh // 2, bw // 2
    h16, w16 = -(-h // 16) * 16, -(-w // 16) * 16
    b = int(os.environ.get("BENCH_BATCH", "1"))
    # Fused BHCW Pallas RCAB chains (ops/pallas_conv.py): avoids XLA's
    # 48->128 lane padding on the full-resolution trunk. BENCH_FUSED=0
    # benches the plain XLA path; 'sub128' fuses only lane-padded (<128ch)
    # groups.
    fv = os.environ.get("BENCH_FUSED", "1")
    fused = {"0": False, "1": True}.get(fv, fv)
    model = lite_isp_net_gfm_lsc(fused_rcab=fused)
    raw = jnp.ones((b, h16, w16, 4), jnp.bfloat16)
    cond = jnp.ones((b, h16, w16, 4), jnp.bfloat16)
    coord = jnp.ones((b, h16, w16, 2), jnp.bfloat16)
    # jit the init: eager init dispatches hundreds of ops one-by-one, which
    # is pathologically slow through remote-dispatch backends.
    log(f"jit init (packed {h16}x{w16})")
    params = jax.jit(model.init)(jax.random.key(0),
                                 raw.astype(jnp.float32),
                                 cond.astype(jnp.float32),
                                 coord.astype(jnp.float32))
    jax.block_until_ready(params)

    # Pass params as an argument: closing over them embeds the weights as
    # executable constants, which remote-dispatch backends re-ship per call.
    # The program also returns a scalar checksum of the frame: on this
    # backend block_until_ready on a large tensor returns before the
    # computation finishes, so timing must wait on a value-dependent scalar.
    @jax.jit
    def fwd(params, raw, cond, coord):
        out = model.apply(params, raw, cond, coord)
        return out, out.astype(jnp.float32).sum()

    log("init done, compiling fwd")
    out, chk = fwd(params, raw, cond, coord)
    _ = float(chk)
    log("fwd compiled, timing")

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out, chk = fwd(params, raw, cond, coord)
    _ = float(chk)  # forces completion of the serialized compute stream
    dt = time.perf_counter() - t0
    fps = iters * b / dt
    log(f"{fps:.2f} fps ({dt / iters * 1000:.2f} ms/frame)")

    line = {
        "metric": f"liteisp_gfm_lsc_raw{bh}x{bw}_fps",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
    }
    if os.environ.get("BENCH_CODEC", "1") != "0":
        # Soft deadline so the headline line always prints even if the
        # codec leg's ~6-8 min of compiles outlive the driver's patience.
        import signal

        def _alarm(signum, frame):
            raise TimeoutError("codec leg exceeded BENCH_DEADLINE")

        deadline = int(os.environ.get("BENCH_DEADLINE", "2400"))
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(deadline)
        try:
            line["codec"] = bench_codec(bh, bw, h16, w16)
        except Exception as e:  # codec leg must not kill the headline line
            line["codec"] = {"error": f"{type(e).__name__}: {e}"}
        finally:
            signal.alarm(0)
    print(json.dumps(line))


def bench_codec(bh, bw, h16, w16):
    """Joint codec leg: forward fps + compress/decompress wall at 4K.

    Runs the winning r4 configuration (codec_bench_r04.json): bf16
    transforms + BHCW Pallas conv halves + the fused heads-in-sublanes
    window-attention kernel; entropy parameters stay f32 for encoder/
    decoder bit-agreement. BENCH_CODEC_FAST=0 benches the plain f32 path.
    """
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final

    if os.environ.get("BENCH_CODEC_FAST", "1") != "0":
        from realcamnet_tpu.ops.attention.wmsa import set_wmsa_pallas

        set_wmsa_pallas("v2")
        model = raw_compression_tcm_final(fused_conv=True,
                                          compute_dtype=jnp.bfloat16)
    else:
        model = raw_compression_tcm_final()
    raw = jnp.full((1, h16, w16, 4), 0.5, jnp.float32)
    cond = raw
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)
    log(f"codec: jit init (packed {h16}x{w16})")
    params = jax.jit(model.init)(jax.random.key(0), raw, cond, coord)
    jax.block_until_ready(params)
    # Trained checkpoint (if present) for realistic symbol statistics.
    try:
        from realcamnet_tpu.train.checkpoint import (latest_checkpoint,
                                                     restore_params)
        for d in ("artifacts/ckpt_sweep12k_r03/lmbda_0.013",
                  "artifacts/ckpt_long_r03/lmbda_0.013"):
            latest = latest_checkpoint(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), d))
            if latest:
                params = restore_params(latest, params)
                log(f"codec: restored {latest}")
                break
    except Exception as e:
        log(f"codec: checkpoint restore skipped: {e}")

    @jax.jit
    def fwd(p, r, c, k):
        out = model.apply(p, r, c, k)
        return (out["x_hat"].astype(jnp.float32).sum()
                + sum(jnp.log(l).sum() for l in out["likelihoods"].values()))

    log("codec: compiling forward")
    _ = float(fwd(params, raw, cond, coord))
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fwd(params, raw, cond, coord)
    _ = float(s)
    fwd_ms = (time.perf_counter() - t0) / iters * 1e3
    log(f"codec forward: {fwd_ms:.1f} ms")

    codec = ChARMCodec(model, params)
    codec.update()
    log("codec: compiling compress/decompress")
    out = codec.compress(raw, cond, coord)
    jax.block_until_ready(codec.decompress(out["strings"], out["shape"])["x_hat"])

    def wall(fn, n=3):
        fn()  # extra warm run: the relay reports 1-2 noisy calls after
        # big compiles (verify skill rule 6)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        return (time.perf_counter() - t0) / n * 1e3, r

    comp_ms, out = wall(lambda: codec.compress(raw, cond, coord))
    dec_ms, _ = wall(lambda: jax.block_until_ready(
        codec.decompress(out["strings"], out["shape"])["x_hat"]))
    nbytes = sum(len(s[0]) for s in out["strings"])
    log(f"codec compress: {comp_ms:.1f} ms, decompress: {dec_ms:.1f} ms")
    return {
        "model": "raw_compression_tcm_final",
        "forward_ms": round(fwd_ms, 2),
        "forward_fps": round(1e3 / fwd_ms, 3),
        "compress_ms": round(comp_ms, 2),
        "decompress_ms": round(dec_ms, 2),
        "bpp_real": round(nbytes * 8.0 / (bh * bw), 5),
    }


if __name__ == "__main__":
    main()
