"""On-chip validation + timing of the Pallas fused window attention.

Proves the seam-flag kernel (ops/attention/pallas_wmsa.py) on real hardware
across the shapes models actually use — TCM stage latents, ChARM SWAtten
128ch, and the joint codec's 4K stage-1 window count — shifted AND
unshifted, with timing vs the XLA path. Timing blocks on a value-dependent
scalar per measurement (block_until_ready on a tensor returns before compute
finishes through the relay backend and under-reports ~1000x).

Writes artifacts/wmsa_chip_check.json.

Usage: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
  timeout 570 python -u tools/chip_check_wmsa.py
(one TPU process at a time — do not run while another chip job is live)
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed_ms(fn, params, x, iters=20):
    s = fn(params, x)
    _ = float(s)  # block on value-dependent scalar (compile + warmup)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(params, x)
    _ = float(s)  # forces completion of the serialized stream
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from realcamnet_tpu.ops.attention.wmsa import SwinBlockPair, WMSA, wmsa_pallas

    log(f"devices: {jax.devices()}")
    results = {}

    # Model-shape cases: (dim, head_dim, H, W). tcm_stage1/charm_swatten as
    # they appear at 1024x1536 RAW; stage1_4k matches the joint codec's
    # stage-1 window count at 4K (544x960 -> 8160 windows).
    cases = [
        ("tcm_stage1", 64, 8, 64, 96),
        ("charm_swatten", 128, 16, 64, 96),
        ("stage1_4k", 128, 32, 544, 960),
    ]
    for name, dim, hd, h, w in cases:
        for shifted in (False, True):
            key = f"{name}_sw{int(shifted)}"
            log(f"case {key}: compile")
            x = jax.random.normal(jax.random.key(0), (1, h, w, dim), jnp.float32)
            ref_m = WMSA(dim, hd, 8, shifted=shifted, use_pallas=False)
            pal_m = WMSA(dim, hd, 8, shifted=shifted, use_pallas=True)
            params = jax.jit(ref_m.init)(jax.random.key(1), x)
            jax.block_until_ready(params)

            out_ref = jax.jit(lambda p, xx: ref_m.apply(p, xx))
            out_pal = jax.jit(lambda p, xx: pal_m.apply(p, xx))
            a = jax.device_get(out_ref(params, x))
            b = jax.device_get(out_pal(params, x))
            err = float(np.max(np.abs(a - b)))

            sum_ref = jax.jit(
                lambda p, xx: ref_m.apply(p, xx).astype(jnp.float32).sum())
            sum_pal = jax.jit(
                lambda p, xx: pal_m.apply(p, xx).astype(jnp.float32).sum())
            rec = {"max_abs_err": err,
                   "xla_ms": round(timed_ms(sum_ref, params, x), 4),
                   "pallas_ms": round(timed_ms(sum_pal, params, x), 4)}
            rec["speedup"] = round(rec["xla_ms"] / rec["pallas_ms"], 3)
            results[key] = rec
            log(f"{key}: {rec}")

    # Whole SwinBlockPair (LN+MLP around both attentions) via the global
    # switch — the path models actually take.
    dim, hd, h, w = 64, 16, 64, 96
    x = jax.random.normal(jax.random.key(2), (1, h, w, dim), jnp.float32)
    log("SwinBlockPair switch: compile")
    mod = SwinBlockPair(dim, hd, 8)
    params = jax.jit(mod.init)(jax.random.key(3), x)
    jax.block_until_ready(params)
    f_ref = jax.jit(lambda p, xx: mod.apply(p, xx))
    a = jax.device_get(f_ref(params, x))
    with wmsa_pallas(True):
        f_pal = jax.jit(lambda p, xx: mod.apply(p, xx))
        b = jax.device_get(f_pal(params, x))
    err = float(np.max(np.abs(a - b)))
    results["swinblockpair_switch"] = {"max_abs_err": err}
    log(f"SwinBlockPair global switch: err={err:.2e}")

    with open("/root/repo/artifacts/wmsa_chip_check.json", "w") as f:
        json.dump(results, f, indent=1)
    log("wrote artifacts/wmsa_chip_check.json")


if __name__ == "__main__":
    import os

    os.makedirs("/root/repo/artifacts", exist_ok=True)
    main()
