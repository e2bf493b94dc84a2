"""TCM standalone codec: 4K forward timing on the real chip (VERDICT r4
weak #7 'Done' criterion: TCM trains from the CLI + a 4K timing row).

Times the eval forward of `TCM(N=64)` (reference harness `tcm.py:642-651`
profiles the same model at 512^2; here at 4K RGB) and a 512^2 row for
direct comparison with the reference's own harness input.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
  python -u tools/chip_tcm_timing.py
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/tcm_timing_r05.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.models.tcm import TCM

    log(f"devices: {jax.devices()}")
    res = {"model": "TCM(N=64, M=320)"}
    model = TCM()
    for tag, (h, w) in (("512x512", (512, 512)), ("4k_2176x3840", (2176, 3840))):
        # H,W must be /64 multiples for the z path; 2160 pads to 2176.
        x = jnp.full((1, h, w, 3), 0.5, jnp.float32)
        params = jax.jit(model.init)(jax.random.key(0), x)
        jax.block_until_ready(params)

        @jax.jit
        def fwd(p, x):
            out = model.apply(p, x)
            return (out["x_hat"].astype(jnp.float32).sum()
                    + sum(jnp.log(l).sum()
                          for l in out["likelihoods"].values()))

        log(f"compiling {tag}")
        _ = float(fwd(params, x))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                s = fwd(params, x)
            _ = float(s)
            samples.append((time.perf_counter() - t0) / 3 * 1e3)
        samples.sort()
        res[tag] = {"forward_ms": round(samples[2], 2),
                    "spread": round(samples[-1] - samples[0], 2)}
        log(f"{tag}: {res[tag]}")
        del params
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
