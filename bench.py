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


def compile_retry(fn, what, attempts=3, backoff=20):
    """The relay's remote_compile intermittently drops long responses
    ('response body closed before all bytes were read'); the compile is
    lost but the process/device are fine — re-dispatching re-compiles."""
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:
            if a == attempts - 1:
                raise
            log(f"{what}: attempt {a + 1} failed ({type(e).__name__}: "
                f"{str(e)[:100]}); retrying in {backoff}s")
            time.sleep(backoff)


def med_spread(samples_ms):
    """Median-of-N protocol (VERDICT r4 weak #3: round-over-round deltas
    near 10% were inside single-measurement noise)."""
    s = sorted(samples_ms)
    n = len(s)
    med = s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])
    return {"median": round(med, 2), "spread": round(s[-1] - s[0], 2), "n": n}


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
    out, chk = compile_retry(lambda: fwd(params, raw, cond, coord),
                             "ISP forward compile")
    _ = float(chk)
    log("fwd compiled, timing")

    # Median of groups: each group pipelines `iters` calls and blocks once
    # on the value-dependent scalar (per-call blocking would bill one relay
    # round trip per frame; within-group pipelining matches steady-state
    # serving).
    groups, iters = 5, 5
    samples = []
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, chk = fwd(params, raw, cond, coord)
        _ = float(chk)  # forces completion of the serialized compute stream
        samples.append((time.perf_counter() - t0) / iters * 1e3)
    stats = med_spread(samples)
    fps = 1e3 * b / stats["median"]
    log(f"{fps:.2f} fps ({stats['median']:.2f} ms/frame, "
        f"spread {stats['spread']:.2f} over {groups} groups of {iters})")

    line = {
        "metric": f"liteisp_gfm_lsc_raw{bh}x{bw}_fps",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "ms_per_frame": stats,
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
    # Trained checkpoint (if present) for realistic symbol statistics —
    # camera-sim sweeps preferred (VERDICT r4 weak #8: the synthetic-data
    # checkpoint describes a model whose conditioning machinery is idle).
    ckpt_used = None
    try:
        from realcamnet_tpu.train.checkpoint import (latest_checkpoint,
                                                     restore_params)
        for d in ("artifacts/ckpt_sweep_cam_r05/lmbda_0.013",
                  "artifacts/ckpt_sweep12k_r03/lmbda_0.013",
                  "artifacts/ckpt_long_r03/lmbda_0.013"):
            latest = latest_checkpoint(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), d))
            if latest:
                params = restore_params(latest, params)
                ckpt_used = d
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
    _ = compile_retry(lambda: float(fwd(params, raw, cond, coord)),
                      "codec forward compile")
    fsamples = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(3):
            s = fwd(params, raw, cond, coord)
        _ = float(s)
        fsamples.append((time.perf_counter() - t0) / 3 * 1e3)
    fstats = med_spread(fsamples)
    fwd_ms = fstats["median"]
    log(f"codec forward: {fwd_ms:.1f} ms (spread {fstats['spread']:.1f})")

    codec = ChARMCodec(model, params)
    codec.update()
    log("codec: compiling compress/decompress")
    out = compile_retry(lambda: codec.compress(raw, cond, coord),
                        "compress compile")
    jax.block_until_ready(compile_retry(
        lambda: codec.decompress(out["strings"], out["shape"]),
        "decompress compile")["x_hat"])

    def wall(fn, n=5):
        fn()  # extra warm run: the relay reports 1-2 noisy calls after
        # big compiles (verify skill rule 6)
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            samples.append((time.perf_counter() - t0) * 1e3)
        return med_spread(samples), r

    cstats, out = wall(lambda: codec.compress(raw, cond, coord))
    dstats, _ = wall(lambda: jax.block_until_ready(
        codec.decompress(out["strings"], out["shape"])["x_hat"]))
    nbytes = sum(len(s[0]) for s in out["strings"])
    log(f"codec compress: {cstats['median']:.1f} ms, "
        f"decompress: {dstats['median']:.1f} ms")
    result = {
        "model": "raw_compression_tcm_final",
        "ckpt": ckpt_used,
        "forward_ms": fwd_ms,
        "forward_ms_stats": fstats,
        "forward_fps": round(1e3 / fwd_ms, 3),
        "compress_ms": cstats["median"],
        "compress_ms_stats": cstats,
        "decompress_ms": dstats["median"],
        "decompress_ms_stats": dstats,
        "bpp_real": round(nbytes * 8.0 / (bh * bw), 5),
    }
    if os.environ.get("BENCH_WRANS", "1") != "0":
        # wrANS device-decoded bitstream (entropy/wrans.py): the whole
        # decode is ONE dispatch; its bpp includes the per-lane header
        # overhead (reported separately — the CompressAI-format number
        # above is the reference-comparable rate). Guarded so a deadline
        # or failure here never loses the host-path metrics above.
        try:
            log("codec: compiling wrANS device-decode path")
            outw = compile_retry(
                lambda: codec.compress_tpu(raw, cond, coord),
                "wrANS encode compile")
            _ = compile_retry(
                lambda: float(codec.decompress_tpu(
                    outw["blob"], outw["shape"])["check"]),
                "wrANS decode compile")
            cwstats, outw = wall(lambda: codec.compress_tpu(raw, cond,
                                                            coord))
            dwstats, _ = wall(lambda: float(codec.decompress_tpu(
                outw["blob"], outw["shape"])["check"]))
            log(f"codec wrANS compress: {cwstats['median']:.1f} ms, "
                f"device decompress: {dwstats['median']:.1f} ms")
            result.update({
                "compress_tpu_ms": cwstats["median"],
                "compress_tpu_ms_stats": cwstats,
                "decompress_tpu_ms": dwstats["median"],
                "decompress_tpu_ms_stats": dwstats,
                "bpp_real_tpu": round(len(outw["blob"]) * 8.0 / (bh * bw),
                                      5),
                "wrans_lanes": outw["num_lanes"],
            })
        except Exception as e:
            result["wrans_error"] = f"{type(e).__name__}: {e}"
    return result


if __name__ == "__main__":
    main()
