"""LPIPS (wiring-only) column for the camera RD sweep checkpoints — on CPU.

Real LPIPS calibration weights cannot enter this environment
(artifacts/lpips_availability_r05.md), so this evaluates the full LPIPS code
path with a fixed-seed RANDOM backbone+calibration: the numbers exercise
the metric end to end and are internally comparable across checkpoints
(same seed), but are NOT comparable to published LPIPS values — hence the
column name `lpips_wiring_only`.

Runs entirely on CPU (the checkpoints are data; eval at the training patch
size on 8 fixed camera-sim images), leaving the chip free.

Usage: python tools/lpips_column_cpu.py [sweep_ckpt_root] [out_json]
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/artifacts/ckpt_sweep_cam_r05"
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/artifacts/lpips_wiring_r05.json"
    from realcamnet_tpu.data.dataset import camera_eval_batches_jax
    from realcamnet_tpu.evaluation.lpips import init_lpips_params
    from realcamnet_tpu.evaluation.rd import eval_dataset
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.train.checkpoint import (latest_checkpoint,
                                                 restore_params)

    model = raw_compression_tcm_final()
    patch, n_imgs = 128, 8
    example = next(iter(camera_eval_batches_jax(1000, 1, patch)))
    params = jax.jit(model.init)(jax.random.key(0), example["raw"],
                                 example["cond"], example["coord"])
    lpips_params = init_lpips_params(jax.random.key(7), net="alex")
    rows = {}
    for d in sorted(os.listdir(root)):
        ckpt = latest_checkpoint(os.path.join(root, d))
        if not ckpt:
            continue
        p = restore_params(ckpt, params)
        ev = eval_dataset(model, p,
                          camera_eval_batches_jax(1000, n_imgs, patch),
                          lpips_params=lpips_params, lpips_net="alex")
        rows[d] = {"lpips_wiring_only": round(ev["lpips"], 4),
                   "psnr_cpu_recheck": round(ev["psnr"], 3),
                   "ms_ssim_db_cpu_recheck": round(ev["ms_ssim_db"], 3),
                   "delta_e_cpu_recheck": round(ev["delta_e"], 3),
                   "bpp_est_cpu_recheck": round(ev["bpp"], 5)}
        print(d, rows[d], flush=True)
    out = {"note": ("RANDOM-calibration LPIPS (seed 7 alex backbone): "
                    "wiring-only, internally comparable, NOT comparable to "
                    "published LPIPS — see "
                    "artifacts/lpips_availability_r05.md"),
           "eval": {"patch": patch, "num_images": n_imgs, "data": "camera"},
           "points": rows}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
