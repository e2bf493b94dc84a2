"""Extend one sweep leg's training from its checkpoint (cosine continued).

The device-loop sweep trains each lambda for `steps` with a cosine schedule
over exactly that horizon; resuming with the stock CLI would either rerun
the full horizon or sit at lr=0 (cosine_decay clamps past niter). This tool
restores the checkpoint (params + optimizer moments + step) and continues
with a cosine over the EXTENDED horizon evaluated at the global step — the
schedule the run would have had if planned for `total_niter` from scratch
(tail only; the first 16k steps keep their original trajectory).

Used for the r5 lmbda=0.05 top-up (the 16k point evaluated at the same
PSNR as lmbda=0.013 — undertrained endgame, train-log PSNR still
oscillating 22.6-26.4 at step 16k).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 python -u \
  tools/chip_topup.py <ckpt_dir> <lmbda> <extra_steps> <total_niter>
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ckpt_dir, lmbda, extra, niter = (sys.argv[1], float(sys.argv[2]),
                                     int(sys.argv[3]), int(sys.argv[4]))
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.data.dataset import camera_batch_jax
    from realcamnet_tpu.train.checkpoint import (latest_checkpoint,
                                                 restore_checkpoint,
                                                 save_checkpoint)
    from realcamnet_tpu.train.isp import TrainState
    from realcamnet_tpu.train.rd import (make_rd_optimizer,
                                         make_rd_train_chunk,
                                         refit_quantiles)
    from realcamnet_tpu.train.schedules import make_schedule

    log(f"devices: {jax.devices()}")
    batch, patch, chunk = 8, 128, 50
    model = raw_compression_tcm_final()
    example = camera_batch_jax(jax.random.key(0), 1, patch)
    params = jax.jit(model.init)(jax.random.key(0), example["raw"],
                                 example["cond"], example["coord"])
    sched = make_schedule("cosine", 1e-4, niter=niter)
    tx = make_rd_optimizer(1e-4, aux_lr=1e-3, clip_norm=1.0, schedule=sched)
    state = TrainState.create(params, tx)
    latest = latest_checkpoint(ckpt_dir)
    state = restore_checkpoint(latest, state)
    step0 = int(jax.device_get(state.step))
    log(f"resumed {latest} @ step {step0}; continuing cosine over {niter}")

    chunk_fn = make_rd_train_chunk(model, lmbda, batch, patch, chunk,
                                   data="camera")
    rng = jax.random.key(1234)
    t0 = time.time()
    for ci in range(-(-extra // chunk)):
        rng, sub = jax.random.split(rng)
        state, ms = chunk_fn(state, sub)
        m = {k: float(v[-1]) for k, v in jax.device_get(ms).items()}
        step = int(jax.device_get(state.step))
        if (ci + 1) % 10 == 0 or ci == 0:
            rate = (step - step0) * batch / (time.time() - t0)
            log(f"step {step} " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(m.items()))
                + f" ({rate:.1f} img/s)")
    new_params, aux_curve = refit_quantiles(model, state.params)
    a0, a1 = float(aux_curve[0]), float(aux_curve[-1])
    if a1 < a0:
        state = state.replace(params=new_params)
    log(f"aux refit {a0:.1f} -> {a1:.1f}")
    ckpt = save_checkpoint(ckpt_dir, state)
    log(f"saved {ckpt}")
    with open("/root/repo/artifacts/topup_r05.json", "a") as f:
        f.write(json.dumps({"ckpt_dir": ckpt_dir, "lmbda": lmbda,
                            "from": step0, "to": step, "final": m,
                            "aux_refit": [a0, a1]}) + "\n")


if __name__ == "__main__":
    main()
