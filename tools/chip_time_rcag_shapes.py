"""Marginal on-chip timing of the fused-BHCW RCAGroup per flagship shape,
plus the 4K tail conv (48->3 @2176x3840) BHCW vs XLA.

XLA baselines from the round-2 stage profile (tools/chip_profile_stages.py):
full-res 48ch group ~71.5 ms, half-res 48ch ~16.5 ms.

Single TPU process; per-phase SIGALRM guards; exits cleanly on overrun so the
relay is never killed mid-op. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 570 python -u tools/chip_time_rcag_shapes.py
"""

import signal
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DEADLINE = time.time() + 520


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def guarded(name, fn, alarm=480):
    if time.time() > DEADLINE - 30:
        log(f"skip {name}: out of time budget")
        sys.exit(0)

    def handler(signum, frame):
        raise TimeoutError(name)

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(alarm)
    try:
        out = fn()
        signal.alarm(0)
        return out
    except TimeoutError:
        log(f"TIMEOUT in {name}; exiting cleanly")
        sys.exit(1)


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
    from realcamnet_tpu.ops.pallas_conv import (conv3x3_bhcw,
                                                fused_rcag_bhcw)

    log(f"devices: {jax.devices()}")
    shapes = [(48, 1088, 1920), (48, 544, 960), (128, 272, 480),
              (128, 136, 240)]
    only = int(sys.argv[1]) if len(sys.argv) > 1 else None
    if only is not None and only >= len(shapes):
        shapes = []
    elif only is not None:
        shapes = [shapes[only]]
    for c, h, w in shapes:
        model = RCAGroup(channels=c, nb=4, fused=False)
        x = jax.random.normal(jax.random.key(1), (1, h, w, c), jnp.bfloat16)
        params = guarded(f"init {c}", lambda: jax.jit(model.init)(
            jax.random.key(0), x.astype(jnp.float32)))
        jax.block_until_ready(params)

        def pal_n(p, x, n):
            o = jnp.transpose(x, (0, 1, 3, 2))
            for _ in range(n):
                o = fused_rcag_bhcw(p["params"], o, 4)
            return jnp.transpose(o, (0, 1, 3, 2)).astype(jnp.float32).sum()

        p1 = jax.jit(lambda p, x: pal_n(p, x, 1))
        p4 = jax.jit(lambda p, x: pal_n(p, x, 4))
        t1 = guarded(f"p1 {c}x{h}", lambda: timeit(p1, params, x))
        t4 = guarded(f"p4 {c}x{h}", lambda: timeit(p4, params, x))
        log(f"rcag c={c} {h}x{w}: bhcw marginal {(t4-t1)/3*1e3:7.2f} ms/group"
            f"  (1x total {t1*1e3:.2f} ms)")

    # 4K tail conv: 48 -> 3 at 2176x3840 (tail_conv1, the 42.5 ms stage).
    H, W = 2176, 3840
    x = jax.random.normal(jax.random.key(2), (1, H, W, 48), jnp.bfloat16)
    wk = jax.random.normal(jax.random.key(3), (3, 3, 48, 8), jnp.float32) * 0.1
    bk = jnp.zeros((8,), jnp.float32)

    @jax.jit
    def tail_pal(x, wk, bk):
        xb = jnp.transpose(x, (0, 1, 3, 2))
        o = conv3x3_bhcw(xb, wk, bk, rg=8, tile_h=8)
        return o.astype(jnp.float32).sum()

    @jax.jit
    def tail_xla(x, wk, bk):
        o = jax.lax.conv_general_dilated(
            x, wk[:, :, :, :3].astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return o.sum()

    if only is not None and only != len([0,1,2,3]):
        return
    tp = guarded("tail pal", lambda: timeit(tail_pal, x, wk, bk))
    tx = guarded("tail xla", lambda: timeit(tail_xla, x, wk, bk))
    log(f"tail conv 48->3(8) @{H}x{W}: XLA {tx*1e3:.2f} ms  "
        f"bhcw {tp*1e3:.2f} ms (both incl ~25 ms relay floor)")


if __name__ == "__main__":
    main()
