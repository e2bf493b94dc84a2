"""On-chip validation + microbench of the Pallas fused RCAB chain.

Runs on the real TPU chip (axon relay rules: single process, jit everything,
params as args). Compares fused_rcag_apply vs the XLA RCAGroup path for
numerics, then times both on a 4K-scale feature map.

Usage: cd /root/repo && timeout 570 python -u tools/chip_check_rcab.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.ops.blocks import RCAGroup
    from realcamnet_tpu.ops.pallas_rcab import fused_rcag_apply

    log(f"devices: {jax.devices()}")
    nb = 4
    c = 48
    dtype = jnp.bfloat16

    # --- numerics check at moderate size ---
    h, w = 64, 256
    model = RCAGroup(channels=c, nb=nb, fused=False)
    x = jax.random.normal(jax.random.key(1), (1, h, w, c), dtype)
    params = jax.jit(model.init)(jax.random.key(0), x.astype(jnp.float32))
    jax.block_until_ready(params)

    @jax.jit
    def ref(params, x):
        out = model.apply(params, x)
        return out, out.astype(jnp.float32).sum()

    @jax.jit
    def fused(params, x):
        out = fused_rcag_apply(params["params"], x, nb)
        return out, out.astype(jnp.float32).sum()

    log("compiling ref")
    o_ref, s_ref = ref(params, x)
    _ = float(s_ref)
    log("compiling fused (Mosaic)")
    o_f, s_f = fused(params, x)
    _ = float(s_f)
    diff = jnp.max(jnp.abs(o_ref.astype(jnp.float32) - o_f.astype(jnp.float32)))
    rel = float(diff) / max(1e-9, float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)))))
    log(f"numerics: max abs diff {float(diff):.3e}  rel {rel:.3e}")
    assert rel < 2e-2, f"fused vs ref mismatch: rel {rel}"

    # --- timing at 4K head-scale: (1, 1088, 1920, 48) like the bench ---
    th, tw = 1088, 1920
    xb = jax.random.normal(jax.random.key(2), (1, th, tw, c), dtype)

    def time_fn(fn, tag, iters=10):
        out, s = fn(params, xb)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            out, s = fn(params, xb)
        _ = float(s)
        dt = (time.perf_counter() - t0) / iters
        log(f"{tag}: {dt * 1000:.2f} ms/call")
        return dt

    log("timing ref @4K-head")
    t_ref = time_fn(ref, "xla  rcag(nb=4,c=48,1088x1920)")
    log("timing fused @4K-head")
    t_f = time_fn(fused, "pallas rcag(nb=4,c=48,1088x1920)")
    log(f"speedup: {t_ref / t_f:.2f}x")


if __name__ == "__main__":
    main()
