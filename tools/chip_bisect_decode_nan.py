"""Bisect the 4K bf16 decompress NaN (wmsa_cost_probe_r04.json: 3.08M NaNs
in decompressed x_hat while the full forward and g_s probes are clean).

Per slice: compare the HOST-DECODED symbols against the encoder's device
symbols (equality isolates rANS/index mismatch vs numeric bug), then track
NaN counts and value ranges of mu/idx/y_hat through the fused decode
pipeline, and finally g_s on the decoded y_hat.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
  python -u tools/chip_bisect_decode_nan.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/decode_nan_bisect_r04.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.entropy import coder as rans
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.train.checkpoint import latest_checkpoint, restore_params

    log(f"devices: {jax.devices()}")
    model = raw_compression_tcm_final(compute_dtype=jnp.bfloat16)
    h16, w16 = 1088, 1920
    raw = jnp.full((1, h16, w16, 4), 0.5, jnp.float32)
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), raw, raw, coord)
    jax.block_until_ready(params)
    params = restore_params(
        latest_checkpoint("/root/repo/artifacts/ckpt_sweep12k_r03/lmbda_0.013"),
        params)
    codec = ChARMCodec(model, params)
    codec.update()
    results = {}

    log("compress")
    out = codec.compress(raw, raw, coord)

    # Encoder-side device symbols for ground truth.
    enc = codec._encode["encode"]
    y, z = enc(params, raw, raw, coord)
    z_np = np.asarray(jax.device_get(z))
    z_str = codec.compress_z(z_np)
    z_hat = jnp.asarray(codec.decompress_z(z_str, z_np.shape[1:3],
                                           z_np.shape[-1]))
    lm, ls = codec._h_synth(params, z_hat)
    syms_enc, idx_enc = codec._compress_device_jit(params, y, lm, ls)
    syms_enc = np.asarray(jax.device_get(syms_enc))
    idx_enc = np.asarray(jax.device_get(idx_enc))
    log(f"encoder symbols: shape {syms_enc.shape}, "
        f"range [{syms_enc.min()}, {syms_enc.max()}]")

    # Fused decode pipeline, instrumented.
    dec = rans.RansDecoder()
    dec.set_stream(out["strings"][0][0])
    hy, wy = out["shape"][0] * 4, out["shape"][1] * 4
    z_hat2 = jnp.asarray(codec.decompress_z(out["strings"][1][0],
                                            out["shape"], 192))
    mu, idx_dev, msup, means, scales = codec._dec_first(params, z_hat2,
                                                        hy=hy, wy=wy)
    slices = []
    for i in range(1, codec.num_slices + 1):
        idx = np.asarray(jax.device_get(idx_dev)).astype(np.int32)
        idx_match = bool((idx.reshape(-1)
                          == idx_enc[i - 1].reshape(-1)).all())
        sym = dec.decode_stream(idx.reshape(-1), codec.gauss.cdfs,
                                codec.gauss.cdf_lengths, codec.gauss.offsets)
        sym_match = bool((sym == syms_enc[i - 1].reshape(-1)).all())
        mu_np = np.asarray(jax.device_get(mu), np.float32)
        rec = {"idx_match": idx_match, "sym_match": sym_match,
               "sym_range": [int(sym.min()), int(sym.max())],
               "mu_nan": int(np.isnan(mu_np).sum()),
               "mu_range": [float(np.nanmin(mu_np)),
                            float(np.nanmax(mu_np))]}
        sym = sym.reshape(idx.shape)
        rv = jnp.asarray(sym.astype(np.int16))
        if i < codec.num_slices:
            yh, mu, idx_dev, msup = codec._dec_step(
                params, rv, mu, msup, tuple(slices), means, scales, i=i)
            yh_np = np.asarray(jax.device_get(yh), np.float32)
            rec["yh_nan"] = int(np.isnan(yh_np).sum())
            rec["yh_range"] = [float(np.nanmin(yh_np)),
                               float(np.nanmax(yh_np))]
            slices.append(yh)
        else:
            x_hat, y_hat = codec._dec_last(params, rv, mu, msup,
                                           tuple(slices), i=i - 1,
                                           decode_method="g_s")
            yh_np = np.asarray(jax.device_get(y_hat), np.float32)
            xh_np = np.asarray(jax.device_get(x_hat), np.float32)
            rec["yhat_full_nan"] = int(np.isnan(yh_np).sum())
            rec["yhat_range"] = [float(np.nanmin(yh_np)),
                                 float(np.nanmax(yh_np))]
            rec["xhat_nan"] = int(np.isnan(xh_np).sum())
        results[f"slice{i - 1}"] = rec
        log(f"slice {i - 1}: {rec}")

    dec.close()
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
