"""Chip probe: where does the Swin half's time go, and does a block-diagonal
window-attention formulation fix the MXU fill in pure XLA?

The hybrid blocks cost ~30 ms each in-graph at the 4K stage-1 shape
(codec_stage_profile_r04.json: 12 of them ≈ 250 of the 342 ms forward), and
the conv-half fusion didn't move e2e time — so the Swin half dominates. Its
attention einsums contract over head_dim=8 (6% MXU fill) and emit tensors
with trailing dim 8 (16x lane padding). The block-diagonal trick packs all
8 heads into ONE (p², C) @ (C, 8·p²) matmul per window (K=64, M=64, N=512):
  S[p, h·p²+q] = Σ_c Q[p,c]·BD[c,h·p²+q],  BD = tile(Kᵀ,8) ⊙ blockdiag mask
and the AV product mirrors it. Everything stays (…, 64/512)-shaped — no
small trailing dims anywhere.

Also probes the r4 fused decode pipeline for the NaN seen in
codec_bench_r04.json (full forward probed clean).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
  python -u tools/chip_probe_wmsa_cost.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/wmsa_cost_probe_r04.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


results = {}


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
    h, w, c, p, hd = 544, 960, 64, 8, 8
    nh = c // hd
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, h, w, c) - 0.5, dt)
    log(f"devices: {jax.devices()}  shape {x.shape} {dt}")

    # -- sub-piece costs --
    from flax import linen as nn

    ln = nn.LayerNorm(epsilon=1e-5)
    pl_ = ln.init(jax.random.key(0), x)
    timed("layernorm", jax.jit(lambda xx: ln.apply(pl_, xx)
                               .astype(jnp.float32).sum()), x)

    dq = nn.Dense(3 * c)
    pq = dq.init(jax.random.key(1), x)
    timed("qkv_dense", jax.jit(lambda xx: dq.apply(pq, xx)
                               .astype(jnp.float32).sum()), x)

    hw_, ww_ = h // p, w // p
    nw = hw_ * ww_

    def window_part(xx):
        xw = xx.reshape(1, hw_, p, ww_, p, c).transpose(0, 1, 3, 2, 4, 5)
        return xw.reshape(1, nw, p * p, c)

    timed("window_partition", jax.jit(
        lambda xx: window_part(xx).astype(jnp.float32).sum()), x)

    qkv = jnp.asarray(rng.rand(1, nw, p * p, 3, nh, hd) - 0.5, dt)
    q5 = qkv[..., 0, :, :].transpose(0, 1, 3, 2, 4)
    k5 = qkv[..., 1, :, :].transpose(0, 1, 3, 2, 4)
    v5 = qkv[..., 2, :, :].transpose(0, 1, 3, 2, 4)
    bias = jnp.asarray(rng.rand(nh, p * p, p * p) - 0.5, jnp.float32)
    scale = hd ** -0.5

    def attn_current(q, k, v):
        sim = jnp.einsum("bwhpc,bwhqc->bwhpq", q, k,
                         preferred_element_type=jnp.float32) * scale
        sim = sim + bias[None, None]
        probs = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        return jnp.einsum("bwhpq,bwhqc->bwhpc", probs, v,
                          preferred_element_type=jnp.float32)

    timed("attn_current", jax.jit(
        lambda a, b_, c_: attn_current(a, b_, c_).astype(jnp.float32).sum()),
        q5, k5, v5)

    # -- block-diagonal formulation: operate on (B*nW, p^2, C) directly --
    qm = jnp.asarray(rng.rand(nw, p * p, c) - 0.5, dt)
    km = jnp.asarray(rng.rand(nw, p * p, c) - 0.5, dt)
    vm = jnp.asarray(rng.rand(nw, p * p, c) - 0.5, dt)
    # Masks/bias as trace-time constants.
    head_of_col = np.arange(nh * p * p) // (p * p)      # (512,)
    head_of_ch = np.arange(c) // hd                     # (64,)
    bd_mask = jnp.asarray((head_of_ch[:, None] == head_of_col[None, :])
                          .astype(np.float32))          # (64, 512)
    bias_cat = jnp.asarray(np.transpose(np.asarray(bias), (0, 1, 2))
                           .reshape(nh, p * p, p * p))  # (h, p2, p2)
    bias_flat = jnp.concatenate([bias_cat[i] for i in range(nh)], axis=-1)
    vd_mask = jnp.asarray((head_of_col[:, None] == head_of_ch[None, :])
                          .astype(np.float32))          # (512, 64)

    def attn_blockdiag(q, k, v):
        # BD_K: (nW, C, h*p^2) = tile(K^T, heads) * mask
        kt = jnp.swapaxes(k, 1, 2)                       # (nW, C, p^2)
        bdk = jnp.tile(kt, (1, 1, nh)) * bd_mask[None].astype(k.dtype)
        s = jnp.einsum("wpc,wcn->wpn", q, bdk,
                       preferred_element_type=jnp.float32) * scale
        s = s + bias_flat[None]
        # softmax per 64-col head block
        s = s.reshape(nw, p * p, nh, p * p)
        pr = jax.nn.softmax(s, axis=-1).reshape(nw, p * p, nh * p * p)
        bdv = jnp.tile(v, (1, nh, 1)) * vd_mask[None].astype(v.dtype)
        return jnp.einsum("wpn,wnc->wpc", pr.astype(v.dtype), bdv,
                          preferred_element_type=jnp.float32)

    timed("attn_blockdiag", jax.jit(
        lambda a, b_, c_: attn_blockdiag(a, b_, c_).astype(jnp.float32).sum()),
        qm, km, vm)

    # parity of the two formulations (same inputs, reshaped)
    q5b = qm.reshape(1, nw, p * p, nh, hd).transpose(0, 1, 3, 2, 4)
    k5b = km.reshape(1, nw, p * p, nh, hd).transpose(0, 1, 3, 2, 4)
    v5b = vm.reshape(1, nw, p * p, nh, hd).transpose(0, 1, 3, 2, 4)
    ref = jax.jit(attn_current)(q5b, k5b, v5b)
    ref = ref.transpose(0, 1, 3, 2, 4).reshape(nw, p * p, c)
    new = jax.jit(attn_blockdiag)(qm, km, vm)
    d = float(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32)).max())
    results["blockdiag_max_diff"] = d
    log(f"blockdiag parity: max diff {d:.3e}")

    # -- full WMSA module + full Swin block --
    from realcamnet_tpu.ops.attention.wmsa import WMSA, SwinTransformerBlock

    wm = WMSA(c, hd, p, False)
    pw = wm.init(jax.random.key(2), x)
    timed("wmsa_module", jax.jit(lambda xx: wm.apply(pw, xx)
                                 .astype(jnp.float32).sum()), x)
    sb = SwinTransformerBlock(c, hd, p, False)
    ps = sb.init(jax.random.key(3), x)
    timed("swin_block", jax.jit(lambda xx: sb.apply(ps, xx)
                                .astype(jnp.float32).sum()), x)

    def mlp_only(xx):
        hh = nn.Dense(4 * c).apply(
            {"params": ps["params"]["mlp0"]}, xx)
        hh = jax.nn.gelu(hh, approximate=False)
        return nn.Dense(c).apply({"params": ps["params"]["mlp1"]}, hh)

    timed("mlp_only", jax.jit(lambda xx: mlp_only(xx)
                              .astype(jnp.float32).sum()), x)

    # -- decompress NaN probe (fused pipeline, bf16 model) --
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.train.checkpoint import latest_checkpoint, restore_params

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
    log("compile compress")
    out = codec.compress(raw, raw, coord)
    log("compile decompress pipeline")
    dec = codec.decompress(out["strings"], out["shape"])
    xh = np.asarray(jax.device_get(dec["x_hat"]), np.float32)
    results["decompress_nan"] = int(np.isnan(xh).sum())
    results["decompress_range"] = [float(np.nanmin(xh)), float(np.nanmax(xh))]
    log(f"decompress nan: {results['decompress_nan']} "
        f"range {results['decompress_range']}")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
