"""Phase accounting for the staged wrANS device decode at 4K.

Where do the ~390 ms (K=2048) go? Times each jitted program with a
blocking barrier (decompress_tpu(timings={})) — note the barriers
serialize the otherwise fully-async 12-dispatch chain, so the phase sum
exceeds the async wall; the DELTA (sum - async wall) is the pipelining
the async chain already recovers. Writes
artifacts/wrans_decode_phases_r05.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
  python -u tools/chip_wrans_phases.py [lanes]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/wrans_decode_phases_r05.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def retry(fn, what, attempts=3, backoff=30):
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:
            if a == attempts - 1:
                raise
            log(f"{what}: attempt {a + 1} failed ({type(e).__name__}: "
                f"{str(e)[:120]}); retrying in {backoff}s")
            time.sleep(backoff)


def main():
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.ops.attention.wmsa import set_wmsa_pallas
    from realcamnet_tpu.train.checkpoint import (latest_checkpoint,
                                                 restore_params)

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
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
    codec = ChARMCodec(model, params)
    codec.update()

    log(f"compiling (K={K})")
    out = retry(lambda: codec.compress_tpu(raw, raw, coord, num_lanes=K),
                "encode compile")
    _ = retry(lambda: float(codec.decompress_tpu(
        out["blob"], out["shape"], num_lanes=K)["check"]), "decode compile")

    # Async wall (median of 5, one blocking scalar per call).
    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        _ = float(codec.decompress_tpu(out["blob"], out["shape"],
                                       num_lanes=K)["check"])
        walls.append((time.perf_counter() - t0) * 1e3)
    walls = sorted(walls[1:])
    async_ms = walls[len(walls) // 2]

    # Blocked per-phase accounting (median of 3 runs per phase key).
    runs = []
    for _ in range(3):
        t = {}
        _ = float(codec.decompress_tpu(out["blob"], out["shape"],
                                       num_lanes=K, timings=t)["check"])
        runs.append(t)
    keys = sorted(set().union(*runs))
    phases = {k: round(sorted(r.get(k, 0.0) for r in runs)[1] * 1e3, 1)
              for k in keys}
    blocked_sum = round(sum(phases.values()), 1)
    res = {
        "frame": "2160x3840 (packed 1088x1920)", "lanes": K, "ckpt": ckpt,
        "async_wall_ms": round(async_ms, 1),
        "blocked_phases_ms": phases,
        "blocked_sum_ms": blocked_sum,
        "pipelining_recovered_ms": round(blocked_sum - async_ms, 1),
        "note": ("params = _dec_first + 4x_dec_step (ChARM attention/conv "
                 "heads, f32-pinned); params_last_incl_gs = last slice + "
                 "the g_s synthesis transform; transports are the lane "
                 "rANS scans (sequential-step-bound, so higher K shrinks "
                 "them). Blocking barriers serialize the async chain — "
                 "blocked_sum > async_wall by the recovered overlap."),
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(json.dumps(res))
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
