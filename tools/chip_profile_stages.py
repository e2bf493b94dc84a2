"""Per-stage on-chip timing of the flagship 4K ISP forward.

Times each stage of LiteISPNet_GFM_LSC at its in-model shape (4K frame:
packed 1088x1920), plus layout experiments, to locate where the 343 ms/frame
goes. Single TPU process (axon relay rules); everything jitted; params as
args; timing blocks on a value-dependent scalar.

Usage: cd /root/repo && timeout 570 python -u tools/chip_profile_stages.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def time_module(name, model, args, iters=10, dtype=jnp.bfloat16, extra=None):
    args = [jax.random.normal(jax.random.key(i), s, dtype)
            for i, s in enumerate(args)]
    init_args = [a.astype(jnp.float32) for a in args]
    if extra:
        init_args += extra
        args += extra
    params = jax.jit(model.init)(jax.random.key(0), *init_args)
    jax.block_until_ready(params)

    @jax.jit
    def fwd(params, *a):
        out = model.apply(params, *a)
        if isinstance(out, tuple):
            out = out[0]
        return out.astype(jnp.float32).sum()

    s = fwd(params, *args)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fwd(params, *args)
    _ = float(s)
    dt = (time.perf_counter() - t0) / iters
    log(f"{name:44s} {dt * 1000:8.2f} ms")
    return dt


def time_fn(name, fn, args, iters=10, dtype=jnp.bfloat16):
    args = [jax.random.normal(jax.random.key(i), s, dtype)
            for i, s in enumerate(args)]

    @jax.jit
    def f(*a):
        return fn(*a).astype(jnp.float32).sum()

    s = f(*args)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(*args)
    _ = float(s)
    dt = (time.perf_counter() - t0) / iters
    log(f"{name:44s} {dt * 1000:8.2f} ms")
    return dt


def main():
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc
    from realcamnet_tpu.ops.blocks import RCAGroup, Conv2d
    from realcamnet_tpu.ops.dwt import dwt_forward, dwt_inverse
    from realcamnet_tpu.ops.pixel import pixel_shuffle
    from realcamnet_tpu.ops.color import ColorConditionGFM
    from realcamnet_tpu.ops.modulation import LensShadingCorrection, ResGFM

    log(f"devices: {jax.devices()}")
    H, W = 1088, 1920  # packed 4K

    # --- full model first (reproduce the 343 ms baseline) ---
    model = lite_isp_net_gfm_lsc()
    t_full = time_module("FULL liteisp_gfm_lsc @4K", model,
                         [(1, H, W, 4), (1, H, W, 4), (1, H, W, 2)])
    # --- per-stage shapes (from LiteISPNet.__call__) ---
    ts = {}
    ts["head conv 4->48 @1088x1920"] = time_fn(
        "head conv 4->48 @1088x1920",
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        [(1, H, W, 4), (3, 3, 4, 48)])
    ts["rcag48 @1088x1920 x2"] = 2 * time_module(
        "RCAGroup(48,nb=4) @1088x1920", RCAGroup(48, nb=4),
        [(1, H, W, 48)])
    ts["rcag48 @544x960 x2"] = 2 * time_module(
        "RCAGroup(48,nb=4) @544x960", RCAGroup(48, nb=4),
        [(1, H // 2, W // 2, 48)])
    ts["rcag128 @272x480 x2"] = 2 * time_module(
        "RCAGroup(128,nb=4) @272x480", RCAGroup(128, nb=4),
        [(1, H // 4, W // 4, 128)])
    ts["rcag128 @136x240 x2 (mid)"] = 2 * time_module(
        "RCAGroup(128,nb=4) @136x240", RCAGroup(128, nb=4),
        [(1, H // 8, W // 8, 128)])
    ts["dwt fwd 48 @1088x1920"] = time_fn(
        "dwt_forward 48 @1088x1920", lambda x: dwt_forward(x),
        [(1, H, W, 48)])
    ts["dwt inv 192 @544x960"] = time_fn(
        "dwt_inverse 192 @544x960", lambda x: dwt_inverse(x),
        [(1, H // 2, W // 2, 192)])
    ts["conv 48->48 @1088x1920"] = time_fn(
        "conv3x3 48->48 @1088x1920",
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        [(1, H, W, 48), (3, 3, 48, 48)])
    ts["tail conv0 48->192 @1088x1920"] = time_fn(
        "tail conv0 48->192 @1088x1920",
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        [(1, H, W, 48), (3, 3, 48, 192)])
    ts["tail PS+conv1 3 @2176x3840"] = time_fn(
        "PS(2)+conv3x3 48->3 @2176x3840",
        lambda x, w: jax.lax.conv_general_dilated(
            pixel_shuffle(x, 2), w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        [(1, H, W, 192), (3, 3, 48, 3)])
    ts["gfm classifier @1088x1920"] = time_module(
        "ColorConditionGFM @1088x1920", ColorConditionGFM(32),
        [(1, H, W, 4)])
    ts["lsc @1088x1920"] = time_module(
        "LensShadingCorrection @1088x1920", LensShadingCorrection(48, 48),
        [(1, H, W, 2)])
    ts["resgfm mod1 @1088x1920"] = time_module(
        "ResGFM(48) @1088x1920", ResGFM(48, 48),
        [(1, H, W, 48)], extra=[jnp.ones((1, 32), jnp.bfloat16)])

    acc = sum(ts.values())
    log(f"--- sum of stages {acc * 1000:.2f} ms vs full {t_full * 1000:.2f} ms ---")

    # --- layout experiments ---
    time_fn("memcpy-ish: x+1 @(1,1088,1920,48)",
            lambda x: x + 1.0, [(1, H, W, 48)])
    time_fn("memcpy-ish: x+1 @(1,1088,1920,128)",
            lambda x: x + 1.0, [(1, H, W, 128)])
    time_module("RCAGroup(128,nb=4) @1088x1920 (pad cmp)",
                RCAGroup(128, nb=4), [(1, H, W, 128)])
    time_module("RCAGroup(48,nb=4) @1088x1920 f32",
                RCAGroup(48, nb=4), [(1, H, W, 48)], dtype=jnp.float32)


if __name__ == "__main__":
    main()
