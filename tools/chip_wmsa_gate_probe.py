"""Re-measure the WMSA-v2 <1024-window gate at the small-map shapes
(VERDICT r4 weak #4): ChARM SWAtten heads (135 windows @ y-res 68x120),
encoder stage-3 / decoder stage-1 (510 windows @ 136x240) — fused kernel
('v2-force', gate bypassed) vs XLA, on the real chip at 4K shapes.

Outcome feeds the gate decision artifact: either the gate opens for some of
these shapes or the negative result is documented with numbers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
  python -u tools/chip_wmsa_gate_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/wmsa_gate_probe_r05.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *args, iters=20):
    _ = float(fn(*args))
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(*args)
        _ = float(s)
        samples.append((time.perf_counter() - t0) / iters * 1e3)
    samples.sort()
    return round(samples[2], 3)


def main():
    from realcamnet_tpu.ops.attention.wmsa import SwinBlockPair, set_wmsa_pallas

    log(f"devices: {jax.devices()}")
    res = {}
    # (name, H, W, dim, head_dim): ChARM head context (inter 128 @ 68x120,
    # 135 windows), stage-3/hyper-ish (64 @ 136x240, 510 windows), and the
    # known-win stage-2 control (64 @ 272x480, 2040 windows).
    cases = [
        ("charm_head_68x120_c128", 68, 120, 128, 16),
        ("stage3_136x240_c64", 136, 240, 64, 32),
        ("stage2_272x480_c64", 272, 480, 64, 32),
    ]
    for name, h, w, c, hd in cases:
        x = jax.random.normal(jax.random.key(0), (1, h, w, c), jnp.bfloat16)
        block = SwinBlockPair(c, hd, 8, 0.0)
        params = jax.jit(block.init)(jax.random.key(1),
                                     x.astype(jnp.float32))
        row = {"windows": -(-h // 8) * (-(-w // 8))}
        for mode, label in ((False, "xla"), ("v2-force", "v2")):
            set_wmsa_pallas(mode)

            @jax.jit
            def f(p, x):
                return block.apply(p, x).astype(jnp.float32).sum()

            row[f"{label}_ms"] = timed(f, params, x)
        row["v2_speedup"] = round(row["xla_ms"] / row["v2_ms"], 3)
        res[name] = row
        log(f"{name}: windows {row['windows']} xla {row['xla_ms']} ms "
            f"v2 {row['v2_ms']} ms ({row['v2_speedup']}x)")
    set_wmsa_pallas(False)
    wins = [k for k, v in res.items() if v["v2_speedup"] > 1.05]
    res["gate_decision"] = (
        f"open gate for: {wins}" if wins else
        "negative result confirmed: v2 loses at every <1024-window shape; "
        "the >=1024 gate stands")
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
