"""Chip diagnostic: WHERE does the decoder's scale-index computation
diverge from the encoder's at 4K?

Both wrANS decode modes fail their lane-state check on the real chip at 4K
with the camera checkpoint while the transport is proven exact
(wrans_chip_unit_r05.json) — so some per-slice table index must differ
between the encode program and the decode-side parameter programs. This
compares, with NO rANS involved:

  encoder idxs[i]  (from the one-dispatch encode program)
vs
  _dec_first / _dec_step idx  (the host-path programs), fed the exact
  device-side z_hat / symbol planes the decoder would see, with rv dtype
  in {int8, int32} (staged transport emits int32; the host path usually
  pushes int8 — a different input dtype is a different compiled program).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
  python -u tools/chip_wrans_idx_diag.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/wrans_idx_diag_r05.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import os

    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.ops.attention.wmsa import set_wmsa_pallas
    from realcamnet_tpu.train.checkpoint import (latest_checkpoint,
                                                 restore_params)

    log(f"devices: {jax.devices()}")
    set_wmsa_pallas("v2")
    model = raw_compression_tcm_final(fused_conv=True,
                                      compute_dtype=jnp.bfloat16)
    h16, w16 = 1088, 1920
    raw = jnp.full((1, h16, w16, 4), 0.5, jnp.float32)
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), raw, raw, coord)
    jax.block_until_ready(params)
    latest = latest_checkpoint(
        "/root/repo/artifacts/ckpt_sweep_cam_r05/lmbda_0.013")
    params = restore_params(latest, params)
    log(f"restored {latest}")
    codec = ChARMCodec(model, params)
    codec.update()

    log("compiling encode program")
    out = codec.compress(raw, raw, coord)  # builds codec._encode["encode"]
    (z_sym32, z_sym16, z_maxabs, syms32, syms16, syms8, maxabs,
     idxs) = codec._encode["encode"](codec.params, raw, raw, coord)
    enc_idx = np.asarray(jax.device_get(idxs)).astype(np.int32)
    enc_sym = np.asarray(jax.device_get(syms32)).astype(np.int32)
    z_sym = jax.device_get(z_sym32)
    log(f"encoder: idx planes {enc_idx.shape}, sym range "
        f"[{enc_sym.min()}, {enc_sym.max()}]")

    # decoder-style z_hat (device): integer syms + medians, same as both
    # wrANS modes build it.
    med = codec._eb_med(codec.params)

    @jax.jit
    def build_z_hat(z_sym, med):
        return z_sym.astype(jnp.float32) + \
            med.astype(jnp.float32)[None, None, None, :]

    z_hat = build_z_hat(jnp.asarray(z_sym), med)
    hz, wz = z_sym.shape[1:3]
    hy, wy = hz * 4, wz * 4

    res = {"ckpt": latest, "frame": "4K packed 1088x1920"}
    log("compiling _dec_first")
    mu, idx_dev, msup, means, scales = codec._dec_first(
        codec.params, z_hat, hy=hy, wy=wy)
    d0 = np.asarray(jax.device_get(idx_dev)).astype(np.int32)
    diff0 = int((d0 != enc_idx[0, 0]).sum())
    res["slice0_idx_diffs"] = diff0
    log(f"slice 0 idx diffs vs encoder: {diff0}")

    for dt, tag in ((np.int8, "int8"), (np.int32, "int32")):
        slices = []
        mu_i, msup_i = mu, msup
        diffs = []
        for i in range(1, codec.num_slices):
            sym_plane = enc_sym[i - 1, 0]  # (hy, wy, 64) true symbols
            if dt is np.int8 and np.abs(sym_plane).max() > 127:
                log(f"{tag}: symbols exceed int8 at slice {i - 1}; skip")
                break
            rv = jnp.asarray(sym_plane[None].astype(dt))
            yh, mu_i, idx_i, msup_i = codec._dec_step(
                codec.params, rv, mu_i, msup_i, tuple(slices), means,
                scales, i=i)
            slices.append(yh)
            di = np.asarray(jax.device_get(idx_i)).astype(np.int32)
            nd = int((di != enc_idx[i, 0]).sum())
            diffs.append(nd)
            log(f"{tag}: slice {i} idx diffs vs encoder: {nd}")
        res[f"slice_idx_diffs_rv_{tag}"] = diffs
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
