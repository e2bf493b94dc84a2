"""On-chip validation + timing of the Pallas fused window attention.

Round-1 VERDICT weak #2 follow-up: `set_wmsa_pallas(True)` now routes every
WMSA (TCM ConvTransBlocks, ChARM SWAtten heads, raw2bit) through
`ops/attention/pallas_wmsa.py`; this proves the kernel on real hardware
(it was interpret-mode-only) — numerics vs the XLA path at model shapes,
then per-layer timing, then a whole SwinBlockPair stack.

Usage: cd /root/repo && timeout 570 python -u tools/chip_check_wmsa.py
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


def main():
    from realcamnet_tpu.ops.attention.wmsa import SwinBlockPair, WMSA, wmsa_pallas

    log(f"devices: {jax.devices()}")
    results = {}

    # Model-shape cases: (dim, head_dim, H, W) as they appear in TCM /
    # raw2bit at 1024x1536 RAW (latent 64x96..256x384) + ChARM SWAtten 128ch.
    cases = [
        ("tcm_stage1", 64, 8, 64, 96),
        ("charm_swatten", 128, 16, 64, 96),
    ]
    for name, dim, hd, h, w in cases:
        for shifted in (False, True):
            log(f"case {name} shifted={shifted}: compile")
            x = jax.random.normal(jax.random.key(0), (1, h, w, dim), jnp.float32)
            ref_m = WMSA(dim, hd, 8, shifted=shifted, use_pallas=False)
            pal_m = WMSA(dim, hd, 8, shifted=shifted, use_pallas=True)
            params = jax.jit(ref_m.init)(jax.random.key(1), x)
            jax.block_until_ready(params)

            @jax.jit
            def f_ref(p, xx):
                return ref_m.apply(p, xx)

            @jax.jit
            def f_pal(p, xx):
                return pal_m.apply(p, xx)

            a = jax.device_get(f_ref(params, x))
            b = jax.device_get(f_pal(params, x))
            err = float(np.max(np.abs(a - b)))
            # Timing: N async calls, block on last.
            for fn, key in ((f_ref, "xla"), (f_pal, "pallas")):
                fn(params, x).block_until_ready()
                n = 20
                t0 = time.perf_counter()
                for _ in range(n - 1):
                    out = fn(params, x)
                out.block_until_ready()
                dt = (time.perf_counter() - t0) / (n - 1) * 1e3
                results.setdefault(f"{name}_sw{int(shifted)}", {})[key + "_ms"] = round(dt, 4)
            results[f"{name}_sw{int(shifted)}"]["max_abs_err"] = err
            log(f"{name} shifted={shifted}: err={err:.2e} "
                f"{results[f'{name}_sw{int(shifted)}']}")

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
