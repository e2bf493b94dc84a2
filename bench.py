"""Benchmark harness: flagship ISP 4K RAW->sRGB throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The north-star metric is RAW frames/sec/chip at 4K (BASELINE.json); the
reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
null. Override the frame size with BENCH_SIZE=HxW (Bayer mosaic size).
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

    print(json.dumps({
        "metric": f"liteisp_gfm_lsc_raw{bh}x{bw}_fps",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
