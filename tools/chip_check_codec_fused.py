"""Hardware check: fused BHCW conv half in one codec hybrid block at the
4K stage-1 shape (1, 544, 960, 128) — parity + timing vs plain XLA, in
bf16 and f32 (VERDICT r3 next #1 smoke before the full-model bench).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 \
  python -u tools/chip_check_codec_fused.py
(one TPU process at a time)
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/codec_fused_block_check_r04.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, n=10):
    _ = float(fn())          # warm
    _ = float(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        s = fn()
    _ = float(s)             # value-dependent scalar block
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from realcamnet_tpu.models.raw2bit import ConvTransBlockMzj
    from realcamnet_tpu.models.tcm import ConvTransBlock

    log(f"devices: {jax.devices()}")
    results = {"shape": "1x544x960x128 (4K stage-1)"}
    h, w = 544, 960
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        x = jnp.asarray(np.random.RandomState(0).rand(1, h, w, 128), dt)
        cond = jnp.asarray(np.random.RandomState(1).rand(1, h, w, 64), dt)
        for cls, name, args in (
                (ConvTransBlockMzj, "cimc", (64, 64, 8, 8)),
                (ConvTransBlock, "csa", (64, 64, 8, 8))):
            plain = cls(*args)
            fused = cls(*args, fused=True)
            need_cond = cls is ConvTransBlockMzj
            ins = (x, cond) if need_cond else (x,)
            params = jax.jit(plain.init)(jax.random.key(0),
                                         *(i.astype(jnp.float32) for i in ins))

            def f_plain(p=params, m=plain, ins=ins):
                return jax.jit(lambda pp, *aa: m.apply(pp, *aa)
                               .astype(jnp.float32).sum())

            jp = jax.jit(lambda pp, *aa, m=plain: m.apply(pp, *aa)
                         .astype(jnp.float32).sum())
            jf = jax.jit(lambda pp, *aa, m=fused: m.apply(pp, *aa)
                         .astype(jnp.float32).sum())
            log(f"compile {name} {dt_name} plain")
            tp = timed(lambda: jp(params, *ins))
            log(f"compile {name} {dt_name} fused")
            tf = timed(lambda: jf(params, *ins))
            # parity on the summed output (full-tensor parity is CPU-tested)
            sp, sf = float(jp(params, *ins)), float(jf(params, *ins))
            rel = abs(sp - sf) / max(abs(sp), 1e-6)
            results[f"{name}_{dt_name}"] = {
                "plain_ms": round(tp, 2), "fused_ms": round(tf, 2),
                "speedup": round(tp / tf, 3), "sum_rel_diff": rel}
            log(f"{name} {dt_name}: plain {tp:.2f} ms, fused {tf:.2f} ms "
                f"({tp/tf:.2f}x), sum rel diff {rel:.2e}")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
