"""ISP 4K: does limiting the BHCW kernel to lane-padded (<128ch) groups beat
fusing everything? (r5, VERDICT #3 follow-up.)

isp_roofline_r05.json shows the isolated mid RCAG (128ch @ 136x240) costs
28.3 ms fused — more than down3 at 4x the pixels — suggesting the Pallas
path is pathological at small maps while XLA has no lane-padding problem at
128ch anyway. This times the e2e flagship forward for fused_rcab in
{True, "sub128"} plus the isolated mid RCAG fused-vs-XLA, on the real chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
  python -u tools/chip_isp_sub128.py
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/isp_sub128_r05.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def med(samples):
    s = sorted(samples)
    n = len(s)
    return round(s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2]), 2)


def main():
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc
    from realcamnet_tpu.ops.blocks import RCAGroup

    log(f"devices: {jax.devices()}")
    H, W = 1088, 1920
    res = {"frame": "2160x3840 (packed 1088x1920)"}

    raw = jnp.ones((1, H, W, 4), jnp.bfloat16)
    cond = raw
    coord = jnp.ones((1, H, W, 2), jnp.bfloat16)
    for mode in (True, "sub128"):
        model = lite_isp_net_gfm_lsc(fused_rcab=mode)
        params = jax.jit(model.init)(jax.random.key(0),
                                     raw.astype(jnp.float32),
                                     cond.astype(jnp.float32),
                                     coord.astype(jnp.float32))
        jax.block_until_ready(params)

        @jax.jit
        def fwd(p, r, c, k):
            return model.apply(p, r, c, k).astype(jnp.float32).sum()

        log(f"compiling e2e fused_rcab={mode}")
        _ = float(fwd(params, raw, cond, coord))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(5):
                s = fwd(params, raw, cond, coord)
            _ = float(s)
            samples.append((time.perf_counter() - t0) / 5 * 1e3)
        ms = med(samples)
        tag = "fused_all" if mode is True else str(mode)
        res[tag] = {"ms_per_frame": ms, "fps_per_chip": round(1e3 / ms, 2)}
        log(f"{tag}: {ms} ms/frame ({1e3 / ms:.2f} fps)")
        del params

    # isolated mid RCAG: fused vs XLA at the true mid shape
    for fused, tag in ((True, "mid_rcag_fused_ms"), (False, "mid_rcag_xla_ms")):
        mod = RCAGroup(128, nb=4, fused=fused)
        if fused:
            x = jax.random.normal(jax.random.key(0), (1, 136, 128, 240),
                                  jnp.bfloat16)
            lay = "bhcw"
        else:
            x = jax.random.normal(jax.random.key(0), (1, 136, 240, 128),
                                  jnp.bfloat16)
            lay = "nhwc"
        p = jax.jit(lambda k, a: mod.init(k, a, lay))(
            jax.random.key(0), x.astype(jnp.float32))
        jax.block_until_ready(p)

        @jax.jit
        def f(p, a):
            return mod.apply(p, a, lay).astype(jnp.float32).sum()

        _ = float(f(p, x))
        t0 = time.perf_counter()
        for _ in range(10):
            s = f(p, x)
        _ = float(s)
        res[tag] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
        log(f"{tag}: {res[tag]} ms")

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
