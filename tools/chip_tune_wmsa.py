"""win_blk sweep for the Pallas window-attention kernel at the 4K stage-1
shape — does batching more windows per grid cell recover the MXU
underutilization (64x32 matmuls) that makes the kernel lose to XLA?

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
  python -u tools/chip_tune_wmsa.py
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from realcamnet_tpu.ops.attention.pallas_wmsa import window_attention

    log(f"devices: {jax.devices()}")
    g, heads, p2, hd = 8160, 4, 64, 32  # stage1 4K: dim 128, head_dim 32
    k = jax.random.key(0)
    q = jax.random.normal(k, (g, heads, p2, hd), jnp.float32)
    kk = jax.random.normal(jax.random.key(1), q.shape, jnp.float32)
    v = jax.random.normal(jax.random.key(2), q.shape, jnp.float32)
    bias = jax.random.normal(jax.random.key(3), (heads, p2, p2), jnp.float32)
    scale = hd ** -0.5

    def xla_ref(q, kk, v, bias):
        sim = jnp.einsum("ghpc,ghqc->ghpq", q, kk) * scale + bias[None]
        return jnp.einsum("ghpq,ghqc->ghpc", jax.nn.softmax(sim, -1), v)

    results = {}
    f = jax.jit(lambda a, b, c, d: xla_ref(a, b, c, d).sum())
    _ = float(f(q, kk, v, bias))
    t0 = time.perf_counter()
    for _ in range(20):
        s = f(q, kk, v, bias)
    _ = float(s)
    results["xla_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
    log(f"xla: {results['xla_ms']} ms")

    for blk in (8, 16, 32, 60):
        fp = jax.jit(lambda a, b, c, d, blk=blk: window_attention(
            a, b, c, d, scale, blk, False).sum())
        try:
            _ = float(fp(q, kk, v, bias))
            t0 = time.perf_counter()
            for _ in range(20):
                s = fp(q, kk, v, bias)
            _ = float(s)
            ms = round((time.perf_counter() - t0) / 20 * 1e3, 3)
        except Exception as e:
            ms = f"error: {type(e).__name__}"
        results[f"pallas_blk{blk}_ms"] = ms
        log(f"blk={blk}: {ms}")

    with open("/root/repo/artifacts/wmsa_tune_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote artifacts/wmsa_tune_r03.json {json.dumps(results)}")


if __name__ == "__main__":
    main()
