"""Benchmark harness: flagship ISP forward throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is reported against our own first recorded value when available.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the axon remote-compile path is slow for big
# graphs; cache keyed on HLO makes reruns near-instant.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc

    log(f"devices: {jax.devices()}")
    model = lite_isp_net_gfm_lsc()
    b, h, w = 1, 512, 512
    raw = jnp.ones((b, h, w, 4), jnp.bfloat16)
    cond = jnp.ones((b, h, w, 4), jnp.bfloat16)
    coord = jnp.ones((b, h, w, 2), jnp.bfloat16)
    # jit the init: eager init dispatches hundreds of ops one-by-one, which
    # is pathologically slow through the axon remote relay.
    log("jit init")
    params = jax.jit(model.init)(jax.random.key(0),
                                 raw.astype(jnp.float32),
                                 cond.astype(jnp.float32),
                                 coord.astype(jnp.float32))
    jax.block_until_ready(params)

    # Pass params as an argument: closing over them embeds the weights as
    # executable constants, which the remote-dispatch backend re-ships every
    # call (25 ms/frame instead of 0.3).
    @jax.jit
    def fwd(params, raw, cond, coord):
        return model.apply(params, raw, cond, coord)

    log("init done, compiling fwd")
    # Warmup / compile.
    out = fwd(params, raw, cond, coord)
    jax.block_until_ready(out)
    log("fwd compiled, timing")

    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, raw, cond, coord)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = iters * b / dt

    print(json.dumps({
        "metric": "liteisp_gfm_lsc_fwd_512_fps",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
