"""tile_h sweep for the BHCW conv kernel on the flagship's two hot shapes.

The roofline artifact says the fused 4K trunk (111.9 ms) sits ~2.2x above a
realistic floor, jointly MXU-fill/VPU/DMA limited. tile_h controls rows per
grid step (DMA size + per-tile overhead amortization); this measures whether
bigger tiles move the needle before touching the kernel structure.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
  python -u tools/chip_tune_conv.py
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from realcamnet_tpu.ops.pallas_conv import conv3x3_bhcw

    log(f"devices: {jax.devices()}")
    shapes = [  # (label, H, C, W) hot shapes of the 4K trunk
        ("fullres48", 1088, 48, 1920),
        ("midres128", 272, 128, 480),
    ]
    results = {}
    for label, h, c, w in shapes:
        x = jax.random.normal(jax.random.key(0), (1, h, c, w), jnp.bfloat16)
        wk = jax.random.normal(jax.random.key(1), (3, 3, c, c), jnp.float32) * 0.05
        b = jnp.zeros((c,), jnp.float32)
        for th in (8, 16, 32, 64):
            f = jax.jit(lambda xx, wkk, bb, th=th: conv3x3_bhcw(
                xx, wkk, bb, tile_h=th).astype(jnp.float32).sum())
            try:
                _ = float(f(x, wk, b))
                t0 = time.perf_counter()
                for _ in range(30):
                    s = f(x, wk, b)
                _ = float(s)
                ms = round((time.perf_counter() - t0) / 30 * 1e3, 3)
            except Exception as e:
                ms = f"error: {type(e).__name__}"
            results[f"{label}_th{th}"] = ms
            log(f"{label} tile_h={th}: {ms}")

    # Tap-packed MXU layout (RCN_CONV_TAPPACK, trace-time env flag): single
    # 90%-K-fill dot vs three 75%-fill dots per row group.
    import os

    from realcamnet_tpu.ops.blocks import RCAGroup

    for label, h, c, w in shapes:
        x = jax.random.normal(jax.random.key(0), (1, h, c, w), jnp.bfloat16)
        wk = jax.random.normal(jax.random.key(1), (3, 3, c, c), jnp.float32) * 0.05
        b = jnp.zeros((c,), jnp.float32)
        for tap in ("0", "1"):
            os.environ["RCN_CONV_TAPPACK"] = tap
            f = jax.jit(lambda xx, wkk, bb, t=tap: conv3x3_bhcw(
                xx, wkk, bb).astype(jnp.float32).sum())
            try:
                _ = float(f(x, wk, b))
                t0 = time.perf_counter()
                for _ in range(30):
                    s = f(x, wk, b)
                _ = float(s)
                ms = round((time.perf_counter() - t0) / 30 * 1e3, 3)
            except Exception as e:
                ms = f"error: {type(e).__name__}"
            results[f"{label}_tap{tap}"] = ms
            log(f"{label} tap_pack={tap}: {ms}")

    # Whole fused RCAGroup chain (nb=4, the flagship's unit) both ways.
    c, h, w = 48, 1088, 1920
    x = jax.random.normal(jax.random.key(2), (1, h, c, w), jnp.bfloat16)
    grp = RCAGroup(c, nb=4, fused=True)
    xn = jnp.transpose(x, (0, 1, 3, 2))
    params = jax.jit(grp.init)(jax.random.key(3), xn.astype(jnp.float32))
    for tap in ("0", "1"):
        os.environ["RCN_CONV_TAPPACK"] = tap
        f = jax.jit(lambda p, xx, t=tap: grp.apply(
            p, xx, layout="bhcw").astype(jnp.float32).sum())
        try:
            _ = float(f(params, x))
            t0 = time.perf_counter()
            for _ in range(20):
                s = f(params, x)
            _ = float(s)
            ms = round((time.perf_counter() - t0) / 20 * 1e3, 3)
        except Exception as e:
            ms = f"error: {type(e).__name__}"
        results[f"rcag48_full4k_tap{tap}"] = ms
        log(f"rcag48 full-res tap_pack={tap}: {ms}")
    os.environ.pop("RCN_CONV_TAPPACK", None)

    with open("/root/repo/artifacts/conv_tune_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote artifacts/conv_tune_r03.json {json.dumps(results)}")


if __name__ == "__main__":
    main()
