"""On-chip RD training validation run (round-1 VERDICT item #2).

Drives a real multi-hundred-step rate-distortion training run of the
flagship joint codec (`raw_compression_tcm_final`, reference
`raw2bit.py:1614-2027`, loss closure `raw2bit.py:1848-1855`) on one TPU
chip with the synthetic paired dataset:

  phase A: train STEPS_A steps at one lambda, logging the loss/bpp/psnr
           curve, then checkpoint;
  phase B: build a FRESH TrainState (different init seed), restore the
           phase-A checkpoint into it, and train STEPS_B more steps —
           proving checkpoint/resume under a live run (curve must continue
           from the restored loss level, not the fresh-init level);
  eval:    `eval_dataset` likelihood metrics + `eval_real_bitstream`
           through the C++ rANS coder; the real bpp must sit within a few
           percent of the likelihood estimate.

Writes artifacts/train_run_r02.json. Single TPU process (axon relay rule);
everything jitted; params as jit args; timing blocks per step.

Usage: cd /root/repo && timeout 2400 python -u tools/chip_train_rd.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LMBDA = 0.01
STEPS_A = 150
STEPS_B = 150
BATCH = 8
PATCH = 128          # packed Bayer patch -> 256x256 sRGB target
LOG_EVERY = 5
CKPT_DIR = "/root/repo/artifacts/ckpt_rd_r02"
OUT = "/root/repo/artifacts/train_run_r02.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.data.dataset import synthetic_batch
    from realcamnet_tpu.evaluation.rd import eval_dataset, eval_real_bitstream
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from realcamnet_tpu.train.isp import TrainState
    from realcamnet_tpu.train.rd import make_rd_optimizer, make_rd_train_step

    t_start = time.time()
    log(f"devices: {jax.devices()}")
    model = raw_compression_tcm_final()
    tx = make_rd_optimizer(1e-4)
    step_fn = make_rd_train_step(model, LMBDA)

    def batch_at(step):
        b = synthetic_batch(step, BATCH, PATCH)
        return {k: jnp.asarray(v) for k, v in b.items()}

    example = batch_at(0)
    log("jit init")
    params = jax.jit(model.init)(jax.random.key(0), example["raw"],
                                 example["cond"], example["coord"])
    jax.block_until_ready(params)
    state = TrainState.create(params, tx)

    curve = []
    rng = jax.random.key(1)

    def run_steps(state, rng, start, count, tag):
        t0 = time.time()
        for i in range(start, start + count):
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch_at(i), sub)
            if (i + 1) % LOG_EVERY == 0 or i == start:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                curve.append({"step": int(jax.device_get(state.step)),
                              "phase": tag, **m})
                log(f"{tag} step {curve[-1]['step']:4d} "
                    f"loss={m['loss']:.3f} bpp={m['bpp']:.4f} "
                    f"psnr={m['psnr']:.2f} aux={m['aux_loss']:.1f}")
        jax.block_until_ready(state.params)
        dt = time.time() - t0
        log(f"{tag}: {count} steps in {dt:.1f}s ({count * BATCH / dt:.2f} img/s)")
        return state, rng, dt

    log("phase A: compile + train")
    state, rng, dt_a = run_steps(state, rng, 0, STEPS_A, "A")
    ckpt_path = save_checkpoint(CKPT_DIR, state)
    log(f"saved {ckpt_path}")
    loss_end_a = curve[-1]["loss"]

    # Phase B: FRESH state (different seed) -> restore -> continue.
    log("phase B: fresh init + restore + resume")
    fresh_params = jax.jit(model.init)(jax.random.key(99), example["raw"],
                                       example["cond"], example["coord"])
    jax.block_until_ready(fresh_params)
    state_b = TrainState.create(fresh_params, tx)
    state_b = restore_checkpoint(ckpt_path, state_b)
    restored_step = int(jax.device_get(state_b.step))
    assert restored_step == STEPS_A, (restored_step, STEPS_A)
    state_b, rng, dt_b = run_steps(state_b, rng, STEPS_A, STEPS_B, "B")

    # Resume sanity: the first post-restore loss must continue from phase A's
    # level (within noise), far below the fresh-init loss level.
    first_b = next(c for c in curve if c["phase"] == "B")
    loss_init = curve[0]["loss"]
    resume_ok = first_b["loss"] < 0.5 * loss_init
    log(f"resume check: init_loss={loss_init:.1f} end_A={loss_end_a:.1f} "
        f"first_B={first_b['loss']:.1f} -> ok={resume_ok}")

    # Final eval: likelihood metrics over 4 held-out images + real bitstream.
    log("eval: likelihood metrics")
    final_params = state_b.params

    def eval_batches():
        for i in range(4):
            b = synthetic_batch(10_000 + i, 1, PATCH)
            yield {k: jnp.asarray(v) for k, v in b.items()}

    ev = eval_dataset(model, final_params, eval_batches())
    log(f"eval: {ev}")
    log("eval: real bitstream (C++ rANS round trip)")
    one = next(eval_batches())
    rb = eval_real_bitstream(model, final_params, one)
    # Likelihood bpp on the very same image, for the estimate-vs-real gap.
    ev1 = eval_dataset(model, final_params, [one])
    gap_pct = 100.0 * (rb["bpp_real"] - ev1["bpp"]) / max(ev1["bpp"], 1e-9)
    log(f"real bpp={rb['bpp_real']:.4f} vs estimate={ev1['bpp']:.4f} "
        f"({gap_pct:+.2f}%)")

    out = {
        "model": "raw_compression_tcm_final",
        "lmbda": LMBDA,
        "batch": BATCH,
        "patch": PATCH,
        "steps": STEPS_A + STEPS_B,
        "curve": curve,
        "resume": {"ckpt": ckpt_path, "restored_step": restored_step,
                   "fresh_init_loss": loss_init,
                   "end_phase_a_loss": loss_end_a,
                   "first_post_resume_loss": first_b["loss"],
                   "ok": bool(resume_ok)},
        "train_s": {"phase_a": dt_a, "phase_b": dt_b},
        "eval_likelihood": ev,
        "eval_real_bitstream": rb,
        "bpp_real_vs_estimate_pct": gap_pct,
        "wall_s": time.time() - t_start,
        "device": str(jax.devices()[0]),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {OUT} (wall {out['wall_s']:.0f}s)")


if __name__ == "__main__":
    main()
