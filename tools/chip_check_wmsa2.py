"""Hardware check for the r4 fused window-attention kernel (pallas_wmsa2).

Targets (artifacts/wmsa_cost_probe_r04.json, 4K stage-1 shape 544x960x64):
XLA attention einsums 24.9 ms, full Swin block 28.2 ms. Measures kernel
parity + timing at the codec stage shapes, Swin-block-level timing with the
kernel on, and the bf16 codec round trip after the f32-charm determinism fix
(decode_nan_bisect_r04.json).

Env: WB=16 kernel window-block size override.
Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
  python -u tools/chip_check_wmsa2.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = os.environ.get("WMSA2_OUT",
                     "/root/repo/artifacts/wmsa2_chip_check_r05.json")
WB = int(os.environ.get("WB", "16"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


results = {"wb": WB}


def timed(tag, jf, *args, n=10):
    t0 = time.perf_counter()
    _ = float(jf(*args))
    ct = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        s = jf(*args)
    _ = float(s)
    ms = (time.perf_counter() - t0) / n * 1e3
    results[tag] = round(ms, 2)
    log(f"{tag}: {ms:.2f} ms (compile {ct:.0f}s)")
    return ms


def main():
    from realcamnet_tpu.ops.attention.wmsa import (SwinTransformerBlock, WMSA,
                                                   wmsa_pallas)

    log(f"devices: {jax.devices()} wb={WB}")

    # Module-level parity + timing at the three codec stage shapes.
    for (h, w, c, hd) in ((544, 960, 64, 8), (272, 480, 64, 16),
                          (136, 240, 64, 32)):
        for shifted in (False, True):
            x = jnp.asarray(np.random.RandomState(0).rand(1, h, w, c) - 0.5,
                            jnp.bfloat16)
            ref = WMSA(c, hd, 8, shifted, use_pallas=False)
            v2 = WMSA(c, hd, 8, shifted, use_pallas="v2")
            p = jax.jit(ref.init)(jax.random.key(1),
                                  x.astype(jnp.float32))
            jr = jax.jit(lambda pp, xx: ref.apply(pp, xx)
                         .astype(jnp.float32).sum())
            jv = jax.jit(lambda pp, xx: v2.apply(pp, xx)
                         .astype(jnp.float32).sum())
            tag = f"{h}x{w}_hd{hd}_{'sw' if shifted else 'w'}"
            tx = timed(f"xla_{tag}", jr, p, x)
            tv = timed(f"v2_{tag}", jv, p, x)
            sr, sv = float(jr(p, x)), float(jv(p, x))
            rel = abs(sr - sv) / max(abs(sr), 1e-6)
            results[f"par_{tag}"] = rel
            log(f"  speedup {tx / tv:.2f}x, sum rel diff {rel:.2e}")

    # Swin block with the kernel on (LN/MLP in XLA).
    x = jnp.asarray(np.random.RandomState(0).rand(1, 544, 960, 64) - 0.5,
                    jnp.bfloat16)
    sb = SwinTransformerBlock(64, 8, 8, False)
    ps = jax.jit(sb.init)(jax.random.key(2), x.astype(jnp.float32))
    timed("swin_block_xla", jax.jit(
        lambda pp, xx: sb.apply(pp, xx).astype(jnp.float32).sum()), ps, x)
    with wmsa_pallas("v2"):
        jv2 = jax.jit(lambda pp, xx: sb.apply(pp, xx)
                      .astype(jnp.float32).sum())
        timed("swin_block_v2", jv2, ps, x)

    # bf16 codec round trip after the f32-charm fix (kernel OFF — isolate
    # the determinism fix first).
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.train.checkpoint import latest_checkpoint, restore_params

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)  # kernel numbers land even if the
        # codec round-trip section below fails
    ckpt = None
    for d in ("/root/repo/artifacts/ckpt_sweep_cam_r05/lmbda_0.013",
              "/root/repo/artifacts/ckpt_sweep12k_r03/lmbda_0.013"):
        ckpt = latest_checkpoint(d)
        if ckpt:
            break
    if ckpt is None or os.environ.get("WMSA2_SKIP_CODEC") == "1":
        log("codec round-trip section skipped")
        return
    model = raw_compression_tcm_final(compute_dtype=jnp.bfloat16)
    h16, w16 = 1088, 1920
    raw = jnp.full((1, h16, w16, 4), 0.5, jnp.float32)
    coord = jnp.zeros((1, h16, w16, 2), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), raw, raw, coord)
    jax.block_until_ready(params)
    params = restore_params(ckpt, params)
    codec = ChARMCodec(model, params)
    codec.update()
    log("compile compress")
    out = codec.compress(raw, raw, coord)
    log("compile decompress")
    dec = codec.decompress(out["strings"], out["shape"])
    xh = np.asarray(jax.device_get(dec["x_hat"]), np.float32)
    results["decompress_nan_after_fix"] = int(np.isnan(xh).sum())
    results["decompress_range"] = [float(xh.min()), float(xh.max())]
    log(f"decompress nan: {results['decompress_nan_after_fix']} "
        f"range {results['decompress_range']}")

    def dec_once():
        d = codec.decompress(out["strings"], out["shape"])
        return float(d["x_hat"].astype(jnp.float32).sum())

    t0 = time.perf_counter()
    for _ in range(3):
        dec_once()
    results["decompress_total_ms"] = round(
        (time.perf_counter() - t0) / 3 * 1e3, 1)
    t0 = time.perf_counter()
    for _ in range(3):
        codec.compress(raw, raw, coord)
    results["compress_total_ms"] = round(
        (time.perf_counter() - t0) / 3 * 1e3, 1)
    log(f"compress {results['compress_total_ms']} ms, "
        f"decompress {results['decompress_total_ms']} ms")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
