"""Large-patch ISP train-step timing: fused BHCW kernels vs XLA (VERDICT r2
item #6).

The r2 fused path gave training nothing: its chain-level custom_vjp re-ran
the XLA forward inside the backward (double forward + full XLA traffic).
r3 replaced it with per-conv custom VJPs (ops/pallas_conv.py conv_op): saved
residuals, dgrad through the same Pallas kernel with flipped taps, small XLA
wgrad. This tool measures what that is worth on a real train step:
`lite_isp_net_gfm_lsc` L1 step at a 512x512 packed patch (1024x1024 Bayer),
fused on vs off.

Writes artifacts/train_step_isp_r03.json.
Usage: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
  timeout 1500 python -u tools/chip_train_isp_step.py
(one TPU process at a time)
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PATCH = int(os.environ.get("PATCH", "512"))
BATCH = int(os.environ.get("BATCH", "1"))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from realcamnet_tpu.data.dataset import synthetic_batch_jax
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc
    from realcamnet_tpu.train.isp import TrainState, make_isp_train_step

    log(f"devices: {jax.devices()}")
    results = {"patch": PATCH, "batch": BATCH}
    batch = synthetic_batch_jax(jax.random.key(0), BATCH, PATCH)
    batch = {k: v.astype(jnp.bfloat16) if k != "coord" else v
             for k, v in batch.items()}

    for fused in (False, True):
        tag = "fused" if fused else "xla"
        model = lite_isp_net_gfm_lsc(fused_rcab=fused)
        log(f"[{tag}] init")
        params = jax.jit(model.init)(
            jax.random.key(0), batch["raw"].astype(jnp.float32),
            batch["cond"].astype(jnp.float32),
            batch["coord"].astype(jnp.float32))
        jax.block_until_ready(params)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
        state = TrainState.create(params, tx)
        step = make_isp_train_step(model)

        log(f"[{tag}] compile train step")
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.key(1))
        # Block on the loss scalar: value-dependent on the whole step
        # (block_until_ready on tensors under-reports through the relay).
        _ = float(metrics["loss"])
        log(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s")
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, jax.random.key(2))
            _ = float(metrics["loss"])
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[f"{tag}_step_ms"] = round(ms, 2)
        log(f"[{tag}] step: {ms:.1f} ms")

    results["speedup"] = round(results["xla_step_ms"] / results["fused_step_ms"], 3)
    os.makedirs("/root/repo/artifacts", exist_ok=True)
    with open("/root/repo/artifacts/train_step_isp_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote artifacts/train_step_isp_r03.json: {json.dumps(results)}")


if __name__ == "__main__":
    main()
