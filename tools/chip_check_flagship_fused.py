"""On-chip parity + timing of the fused (BHCW-trunk) flagship ISP.

(a) fused vs unfused outputs at 512x512 packed (bf16 tolerance),
(b) 4K timing with BENCH-style blocking, all groups fused (rg auto).

Single TPU process. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/chip_check_flagship_fused.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc

    log(f"devices: {jax.devices()}")
    m_ref = lite_isp_net_gfm_lsc()
    m_fus = lite_isp_net_gfm_lsc(fused_rcab=True)

    h, w = 256, 256  # packed 512x512 bayer
    raw = jax.random.uniform(jax.random.key(0), (1, h, w, 4), jnp.bfloat16)
    cond = jax.random.uniform(jax.random.key(1), (1, h, w, 4), jnp.bfloat16)
    coord = jax.random.uniform(jax.random.key(2), (1, h, w, 2), jnp.bfloat16)
    params = jax.jit(m_ref.init)(jax.random.key(3), raw.astype(jnp.float32),
                                 cond.astype(jnp.float32),
                                 coord.astype(jnp.float32))
    jax.block_until_ready(params)

    @jax.jit
    def f_ref(p, r, c, co):
        o = m_ref.apply(p, r, c, co)
        return o, o.astype(jnp.float32).sum()

    @jax.jit
    def f_fus(p, r, c, co):
        o = m_fus.apply(p, r, c, co)
        return o, o.astype(jnp.float32).sum()

    log("compiling unfused @512")
    a, s = f_ref(params, raw, cond, coord)
    _ = float(s)
    log("compiling fused @512")
    b, s = f_fus(params, raw, cond, coord)
    _ = float(s)
    a32 = jnp.asarray(a, jnp.float32)
    b32 = jnp.asarray(b, jnp.float32)
    d = float(jnp.max(jnp.abs(a32 - b32)))
    scale = float(jnp.max(jnp.abs(a32)))
    log(f"flagship fused-vs-unfused @512: max abs diff {d:.3e} "
        f"(scale {scale:.2f}, rel {d / scale:.3e})")
    assert d / scale < 3e-2, "fused flagship diverges on chip"

    # 4K timing, all groups fused.
    hh, ww = 1088, 1920
    raw4 = jnp.ones((1, hh, ww, 4), jnp.bfloat16)
    cond4 = jnp.ones((1, hh, ww, 4), jnp.bfloat16)
    coord4 = jnp.ones((1, hh, ww, 2), jnp.bfloat16)
    params4 = jax.jit(m_ref.init)(jax.random.key(4),
                                  raw4.astype(jnp.float32),
                                  cond4.astype(jnp.float32),
                                  coord4.astype(jnp.float32))
    jax.block_until_ready(params4)
    log("compiling fused @4K (all groups)")
    _, s = f_fus(params4, raw4, cond4, coord4)
    _ = float(s)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        _, s = f_fus(params4, raw4, cond4, coord4)
    _ = float(s)
    dt = (time.perf_counter() - t0) / iters
    log(f"all-fused 4K: {1 / dt:.2f} fps ({dt * 1e3:.2f} ms/frame)")


if __name__ == "__main__":
    main()
