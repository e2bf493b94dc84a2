"""ISP 4K roofline r5: fused-trunk per-component costs + batch throughput.

VERDICT r4 next #3 asks for >= 11 fps or a committed demonstration of the
floor with per-segment numbers. This measures, on the real chip with the
full fused stack (BHCW Pallas RCAB chains):

1. whole-forward ms/frame at batch 1/2/4 — frames/sec/chip is a THROUGHPUT
   metric; batching amortizes per-dispatch overhead and raises MXU fill on
   the 48-ch trunk, so batched serving throughput is reported alongside the
   batch-1 latency headline;
2. isolated per-component walls at their true in-model shapes (fused RCAG
   trunks, head/mod convs, DWT/IWT, middle, tail) — the additive model vs
   the e2e wall bounds what XLA overlap already hides;
3. an analytic floor per component: HBM traffic at 819 GB/s and MXU FLOPs
   at the 48-ch fill the hardware can reach (K=48 contraction => ~37% of
   the 128-wide MXU; that fill ceiling, not scheduling, is the structural
   gap — raising it requires K-packing the taps, measured 12x-negative in
   r4, or wider channels).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
  python -u tools/chip_isp_roofline_r05.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/isp_roofline_r05.json"
HBM_GBS = 819.0
MXU_TFLOPS = 197.0  # v5e bf16 peak


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def med(samples):
    s = sorted(samples)
    n = len(s)
    return round(s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2]), 2)


def main():
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc
    from realcamnet_tpu.ops.blocks import Conv2d, RCAGroup
    from realcamnet_tpu.ops.dwt import dwt_forward_bhcw, dwt_inverse_bhcw

    log(f"devices: {jax.devices()}")
    H, W = 1088, 1920
    res = {"frame": "2160x3840 (packed 1088x1920)", "stack": "fused BHCW"}

    # ---- 1. whole forward, batch sweep ----
    model = lite_isp_net_gfm_lsc(fused_rcab=True)
    batches = (() if os.environ.get("ISP_SKIP_BATCH") == "1" else (1, 2, 4))
    for b in batches:
        raw = jnp.ones((b, H, W, 4), jnp.bfloat16)
        cond = raw
        coord = jnp.ones((b, H, W, 2), jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.key(0),
                                     raw.astype(jnp.float32),
                                     cond.astype(jnp.float32),
                                     coord.astype(jnp.float32))
        jax.block_until_ready(params)

        @jax.jit
        def fwd(p, r, c, k):
            return model.apply(p, r, c, k).astype(jnp.float32).sum()

        _ = float(fwd(params, raw, cond, coord))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(5):
                s = fwd(params, raw, cond, coord)
            _ = float(s)
            samples.append((time.perf_counter() - t0) / 5 * 1e3)
        ms = med(samples)
        res[f"batch{b}"] = {"ms_per_call": ms,
                            "ms_per_frame": round(ms / b, 2),
                            "fps_per_chip": round(1e3 * b / ms, 2)}
        log(f"batch {b}: {ms} ms/call, {1e3 * b / ms:.2f} fps/chip")
        del params

    # ---- 2. isolated components at true shapes (batch 1, bf16, BHCW) ----
    def timed_mod(name, module, shapes, lay="bhcw", extra=None, iters=10):
        args = [jax.random.normal(jax.random.key(i), s, jnp.bfloat16)
                for i, s in enumerate(shapes)]
        init_args = [a.astype(jnp.float32) for a in args]
        # init must see the same layout arg or it traces the BHCW tensor as
        # NHWC (C=W) and builds wrong-shaped params.
        p = jax.jit(lambda k, *a: (module.init(k, *a, lay) if lay
                                   else module.init(k, *a)))(
            jax.random.key(0), *init_args)
        jax.block_until_ready(p)

        @jax.jit
        def f(p, *a):
            out = module.apply(p, *a, lay) if lay else module.apply(p, *a)
            if isinstance(out, tuple):
                out = out[0]
            return out.astype(jnp.float32).sum()

        _ = float(f(p, *args))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = f(p, *args)
        _ = float(s)
        dt = (time.perf_counter() - t0) / iters * 1e3
        log(f"  {name:36s} {dt:8.2f} ms")
        return round(dt, 2)

    def timed_fn(name, fn, shapes, iters=10):
        args = [jax.random.normal(jax.random.key(i), s, jnp.bfloat16)
                for i, s in enumerate(shapes)]

        @jax.jit
        def f(*a):
            return fn(*a).astype(jnp.float32).sum()

        _ = float(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = f(*args)
        _ = float(s)
        dt = (time.perf_counter() - t0) / iters * 1e3
        log(f"  {name:36s} {dt:8.2f} ms")
        return round(dt, 2)

    log("isolated components (BHCW layout, bf16):")
    comps = {}
    # trunk RCAGs (nb=4): shapes per stage (BHCW: B,H,C,W)
    comps["down1_rcag_48@1088x1920"] = timed_mod(
        "down1 RCAG 48ch full-res", RCAGroup(48, nb=4, fused=True),
        [(1, 1088, 48, 1920)])
    comps["down2_rcag_48@544x960"] = timed_mod(
        "down2 RCAG 48ch 1/2", RCAGroup(48, nb=4, fused=True),
        [(1, 544, 48, 960)])
    comps["down3_rcag_128@272x480"] = timed_mod(
        "down3 RCAG 128ch 1/4", RCAGroup(128, nb=4, fused=True),
        [(1, 272, 128, 480)])
    comps["mid_rcag_128@136x240_x2"] = round(2 * timed_mod(
        "mid RCAG 128ch 1/8", RCAGroup(128, nb=4, fused=True),
        [(1, 136, 128, 240)]), 2)
    comps["up3_rcag_128@272x480"] = comps["down3_rcag_128@272x480"]
    comps["up2_rcag_48@544x960"] = comps["down2_rcag_48@544x960"]
    comps["up1_rcag_48@1088x1920"] = comps["down1_rcag_48@1088x1920"]
    comps["head_conv_4to48"] = timed_mod(
        "head conv 4->48 full-res", Conv2d(48, 3, 1, 1),
        [(1, 1088, 4, 1920)])
    comps["stage_convs_est"] = round(sum((
        timed_mod("conv 48->48 full-res", Conv2d(48, 3, 1, 1),
                  [(1, 1088, 48, 1920)]),
        timed_mod("conv 48->48 1/2", Conv2d(48, 3, 1, 1),
                  [(1, 544, 48, 960)]) * 2,
        timed_mod("conv 192->128 1/4", Conv2d(128, 3, 1, 1),
                  [(1, 272, 192, 480)]) * 2,
    )), 2)
    comps["dwt_all"] = round(sum((
        timed_fn("dwt 48 full-res", dwt_forward_bhcw, [(1, 1088, 48, 1920)]),
        timed_fn("dwt 48 1/2", dwt_forward_bhcw, [(1, 544, 48, 960)]),
        timed_fn("dwt 128 1/4", dwt_forward_bhcw, [(1, 272, 128, 480)]),
        timed_fn("iwt 512 1/8", dwt_inverse_bhcw, [(1, 136, 512, 240)]),
        timed_fn("iwt 192 1/4", dwt_inverse_bhcw, [(1, 272, 192, 480)]),
        timed_fn("iwt 192 1/2", dwt_inverse_bhcw, [(1, 544, 192, 960)]),
    )), 2)
    res["isolated_components_ms"] = comps
    res["isolated_sum_ms"] = round(sum(v for v in comps.values()), 2)

    # ---- 3. analytic floors ----
    def conv_floor(hh, ww, cin, cout, n_convs, fill):
        flops = 2 * hh * ww * 9 * cin * cout * n_convs
        traffic = hh * ww * (cin + cout) * 2 * n_convs
        return max(flops / (MXU_TFLOPS * 1e12 * fill),
                   traffic / (HBM_GBS * 1e9)) * 1e3

    fill48, fill128 = 0.37, 0.9  # K=48 vs K>=128 contraction MXU fill
    floor = (
        conv_floor(1088, 1920, 48, 48, 2 * 8 + 3, fill48)      # stage1+up1
        + conv_floor(544, 960, 48, 48, 2 * 8 + 3, fill48)      # stage2+up2
        + conv_floor(272, 480, 128, 128, 2 * 8 + 3, fill128)
        + conv_floor(136, 240, 128, 128, 4 * 8 + 2, fill128)
    )
    res["analytic_floor_ms"] = {
        "at_achievable_fill": round(floor, 1),
        "at_100pct_fill": round(
            conv_floor(1088, 1920, 48, 48, 19, 1.0)
            + conv_floor(544, 960, 48, 48, 19, 1.0)
            + conv_floor(272, 480, 128, 128, 19, 1.0)
            + conv_floor(136, 240, 128, 128, 34, 1.0), 1),
        "note": ("48-ch trunk convs contract over K=48 -> <=37% of the "
                 "128-wide MXU regardless of schedule; the '39.6 ms SOL' of "
                 "roofline_r03 assumed full fill. At the fill this channel "
                 "width admits, the floor is the at_achievable_fill figure; "
                 "K-packing taps to raise fill was measured 12x-negative "
                 "(isp_pair_check_r04, bhcw tuning memory)."),
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
