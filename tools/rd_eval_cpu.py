"""Canonical RD table for the camera sweep checkpoints, recomputed on CPU.

The rANS round trip is bit-exact on any backend, so the real-bitstream RD
numbers are backend-independent; recomputing them here (a) uses the
post-sweep fixed code path, (b) leaves the chip free, and (c) cross-checks
the chip sweep's in-process eval (whose lmbda=0.013 MS-SSIM column showed a
not-reproducible 21 dB mean; CPU per-image recompute gives ~10-11 dB on the
same checkpoint — same signature as the r3 metric anomaly, recorded here).

Per checkpoint: forward metrics (+ wiring-only LPIPS, see
artifacts/lpips_availability_r05.md), whole-set real-bitstream verification
(bpp gap distribution), per-image rows.

Usage: python tools/rd_eval_cpu.py <ckpt_root> <out_json> [model_name]
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

import numpy as np  # noqa: E402


def main():
    root = sys.argv[1]
    out_path = sys.argv[2]
    model_name = sys.argv[3] if len(sys.argv) > 3 else \
        "raw_compression_tcm_final"
    from realcamnet_tpu.data.dataset import camera_eval_batches_jax
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.evaluation.lpips import init_lpips_params
    from realcamnet_tpu.evaluation.rd import (_make_eval_fn,
                                              eval_forward_metrics,
                                              eval_real_bitstream)
    from realcamnet_tpu.models.raw2bit import RAW2BIT_MODELS
    from realcamnet_tpu.train.checkpoint import (latest_checkpoint,
                                                 restore_params)

    model = RAW2BIT_MODELS[model_name]()
    patch, n_imgs = 128, 8
    example = next(iter(camera_eval_batches_jax(1000, 1, patch)))
    params = jax.jit(model.init)(jax.random.key(0), example["raw"],
                                 example["cond"], example["coord"])
    lpips_params = init_lpips_params(jax.random.key(7), net="alex")
    fn = _make_eval_fn(model, lpips_params=lpips_params)
    codec = None
    points = []
    for d in sorted(os.listdir(root), key=lambda v: float(v.split("_")[1])):
        ckpt = latest_checkpoint(os.path.join(root, d))
        if not ckpt:
            continue
        p = restore_params(ckpt, params)
        if codec is None:
            codec = ChARMCodec(model, p)
        else:
            codec.params = p
        codec.update()
        per_img = []
        acc = {}
        for b in camera_eval_batches_jax(1000, n_imgs, patch):
            est = eval_forward_metrics(model, p, b, _fn=fn)
            rb = eval_real_bitstream(model, p, b, codec=codec)
            rb["bpp_est"] = est["bpp"]
            rb["lpips_wiring_only"] = est["lpips"]
            rb["bpp_gap_pct"] = (100 * (rb["bpp_real"] - est["bpp"])
                                 / max(est["bpp"], 1e-9))
            per_img.append(rb)
            for k, v in est.items():
                acc[k] = acc.get(k, 0.0) + v / n_imgs
        row = dict(acc)
        for k in per_img[0]:
            vals = np.array([x[k] for x in per_img], np.float64)
            row[k] = float(vals.mean())
            if k == "bpp_gap_pct":
                row["bpp_gap_pct_max"] = float(vals.max())
        row = {k: round(v, 5) for k, v in row.items()}
        row["lmbda"] = float(d.split("_")[1])
        row["ckpt"] = ckpt
        row["per_image"] = [{k: round(v, 4) for k, v in x.items()}
                            for x in per_img]
        points.append(row)
        print(d, {k: row[k] for k in ("bpp_real", "psnr", "ms_ssim_db",
                                      "delta_e", "lpips_wiring_only",
                                      "bpp_gap_pct")}, flush=True)
    out = {"model": model_name, "data": "camera",
           "eval": {"patch": patch, "num_images": n_imgs,
                    "backend": "cpu (bit-exact coder; see module doc)"},
           "points": points}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
