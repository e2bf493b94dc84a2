"""Marginal on-chip timing of fused-BHCW vs XLA RCAGroup per flagship shape.

Times f(x) = chain of 4 identical groups minus 1 group (marginal), removing
the ~25 ms relay round-trip floor. Single TPU process.
Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 570 python -u tools/chip_time_rcag_shapes.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timeit(fn, *args, iters=8):
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from realcamnet_tpu.ops.blocks import RCAGroup
    from realcamnet_tpu.ops.pallas_conv import fused_rcag_bhcw

    log(f"devices: {jax.devices()}")
    shapes = [(48, 1088, 1920), (48, 544, 960), (128, 272, 480),
              (128, 136, 240)]
    for c, h, w in shapes:
        model = RCAGroup(channels=c, nb=4, fused=False)
        x = jax.random.normal(jax.random.key(1), (1, h, w, c), jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.key(0),
                                     x.astype(jnp.float32))
        jax.block_until_ready(params)

        def ref_n(p, x, n):
            o = x
            for _ in range(n):
                o = model.apply(p, o)
            return o.astype(jnp.float32).sum()

        def pal_n(p, x, n):
            o = jnp.transpose(x, (0, 1, 3, 2))
            for _ in range(n):
                o = fused_rcag_bhcw(p["params"], o, 4)
            return jnp.transpose(o, (0, 1, 3, 2)).astype(jnp.float32).sum()

        r1 = jax.jit(lambda p, x: ref_n(p, x, 1))
        r4 = jax.jit(lambda p, x: ref_n(p, x, 4))
        p1 = jax.jit(lambda p, x: pal_n(p, x, 1))
        p4 = jax.jit(lambda p, x: pal_n(p, x, 4))
        tr = (timeit(r4, params, x) - timeit(r1, params, x)) / 3
        tp = (timeit(p4, params, x) - timeit(p1, params, x)) / 3
        log(f"rcag c={c} {h}x{w}: XLA {tr*1e3:7.2f} ms  "
            f"bhcw {tp*1e3:7.2f} ms  ({tr/max(tp,1e-9):.2f}x)")


if __name__ == "__main__":
    main()
