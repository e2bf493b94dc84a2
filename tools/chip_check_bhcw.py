"""On-chip validation + microbench of the BHCW Pallas conv / fused RCAGroup.

Axon relay rules: single process, jit everything, params as args, timing
blocks per call. Usage: cd /root/repo && timeout 570 python -u tools/chip_check_bhcw.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timeit(fn, *args, iters=10):
    fn(*args)[1].block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        out[1].block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from realcamnet_tpu.ops.blocks import RCAGroup
    from realcamnet_tpu.ops.pallas_conv import (conv3x3_bhcw, _bhcw_ref_conv,
                                                fused_rcag_bhcw)

    log(f"devices: {jax.devices()}")
    C, H, W = 48, 1088, 1920
    dtype = jnp.bfloat16

    # --- numerics: plain conv at moderate size ---
    x = jax.random.normal(jax.random.key(1), (1, 64, C, 256), dtype)
    w = (jax.random.normal(jax.random.key(2), (3, 3, C, C), jnp.float32)
         * 0.05)
    b = jax.random.normal(jax.random.key(3), (C,), jnp.float32)

    @jax.jit
    def f_pal(x, w, b):
        o = conv3x3_bhcw(x, w, b, relu=True)
        return o, o.astype(jnp.float32).sum()

    @jax.jit
    def f_ref(x, w, b):
        o = _bhcw_ref_conv(x, w, b, relu=True)
        return o, o.astype(jnp.float32).sum()

    log("compiling pallas conv (Mosaic)")
    op, _ = f_pal(x, w, b)
    orf, _ = f_ref(x, w, b)
    d = float(jnp.max(jnp.abs(op.astype(jnp.float32) - orf.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(orf.astype(jnp.float32))))
    log(f"conv numerics: max abs diff {d:.3e} (scale {scale:.2f})")
    assert d / scale < 2e-2

    # --- single conv timing at 4K full-res shape ---
    x4 = jax.random.normal(jax.random.key(4), (1, H, C, W), dtype)
    t = timeit(f_pal, x4, w, b)
    gflop = 2 * H * W * C * C * 9 / 1e9
    log(f"pallas conv 48ch @{H}x{W}: {t*1e3:.2f} ms  "
        f"({gflop/t/1e3:.1f} TFLOP/s)")
    t = timeit(f_ref, x4, w, b)
    log(f"XLA   conv  (bhcw ref, transposes inside): {t*1e3:.2f} ms")

    # --- fused RCAGroup chain at 4K full-res shape ---
    nb = 4
    model = RCAGroup(channels=C, nb=nb, fused=False)
    xi = jax.random.normal(jax.random.key(5), (1, H, W, C), dtype)
    params = jax.jit(model.init)(jax.random.key(0), xi.astype(jnp.float32))
    jax.block_until_ready(params)

    @jax.jit
    def g_ref(p, x):
        o = model.apply(p, x)
        return o, o.astype(jnp.float32).sum()

    @jax.jit
    def g_pal(p, xb):
        o = fused_rcag_bhcw(p["params"], xb, nb)
        return o, o.astype(jnp.float32).sum()

    xb = jnp.transpose(xi, (0, 1, 3, 2))
    log("compiling fused rcag (Mosaic)")
    ob, _ = g_pal(params, xb)
    orf, _ = g_ref(params, xi)
    ob_nhwc = jnp.transpose(ob, (0, 1, 3, 2)).astype(jnp.float32)
    d = float(jnp.max(jnp.abs(ob_nhwc - orf.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(orf.astype(jnp.float32))))
    log(f"rcag numerics: max abs diff {d:.3e} (scale {scale:.2f})")

    t_ref = timeit(g_ref, params, xi)
    t_pal = timeit(g_pal, params, xb)
    log(f"RCAGroup nb=4 48ch @{H}x{W}: XLA {t_ref*1e3:.2f} ms  "
        f"pallas-bhcw {t_pal*1e3:.2f} ms  ({t_ref/t_pal:.2f}x)")

    # --- with NHWC<->BHCW transposes included (model-boundary cost) ---
    @jax.jit
    def g_pal_t(p, x):
        xb = jnp.transpose(x, (0, 1, 3, 2))
        o = fused_rcag_bhcw(p["params"], xb, nb)
        o = jnp.transpose(o, (0, 1, 3, 2))
        return o, o.astype(jnp.float32).sum()

    t_palt = timeit(g_pal_t, params, xi)
    log(f"pallas-bhcw incl. boundary transposes: {t_palt*1e3:.2f} ms  "
        f"({t_ref/t_palt:.2f}x)")


if __name__ == "__main__":
    main()
