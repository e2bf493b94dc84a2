"""Canonical end-to-end verify drive on the real chip (see the verify skill):

1. ISP on an odd-size Bayer frame: pack -> pad16 -> jit forward -> crop.
2. Tiny TCM real-bitstream round trip: decompress(compress(x)) must equal
   the eval forward's x_hat EXACTLY (hard-round path, diff 0.0), and a
   second compress() on the same ChARMCodec must be fast (catches per-call
   retraces, the r3 codec bug class).
3. Truncated bitstream: decodes garbage or raises cleanly, never crashes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 570 \
  python -u tools/chip_e2e_drive.py     (one TPU process at a time)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


log(f"devices: {jax.devices()}")

# 1. ISP on an odd-size Bayer frame: pack -> pad16 -> forward -> crop.
from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc
from realcamnet_tpu.ops.pixel import pack_bayer, pad_to_multiple, remove_padding_2x

bayer = jnp.asarray(np.random.RandomState(0).rand(1, 246, 330, 1), jnp.float32)
packed = pack_bayer(bayer)
padded, (ph, pw) = pad_to_multiple(packed, 16)
coord = jnp.zeros(padded.shape[:3] + (2,), jnp.float32)
model = lite_isp_net_gfm_lsc()
params = jax.jit(model.init)(jax.random.key(0), padded, padded, coord)
out = jax.jit(lambda p, r, c, k: model.apply(p, r, c, k))(params, padded, padded, coord)
out = remove_padding_2x(out, (packed.shape[1], packed.shape[2]))
assert out.shape == (1, 246, 330, 3), out.shape
assert bool(jnp.isfinite(out).all())
log(f"ISP odd-size OK: {out.shape}")

# 2. Tiny TCM real-bitstream round trip: decompress(compress(x)) must equal
#    the eval forward's x_hat exactly (hard-round path).
from realcamnet_tpu.models.tcm import TCM
from realcamnet_tpu.entropy.codec import ChARMCodec

tcm = TCM(config=(1,) * 6, head_dim=(4,) * 6, n=8, m=20)
x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
tp = jax.jit(tcm.init)(jax.random.key(1), x)
codec = ChARMCodec(tcm, tp)
codec.update()
t0 = time.time()
enc = codec.compress(x, encode_method="encode")
nbytes = sum(len(s[0]) for s in enc["strings"])
dec = codec.decompress(enc["strings"], enc["shape"])
fwd = jax.jit(lambda p, xx: tcm.apply(p, xx))(tp, x)
diff = float(jnp.max(jnp.abs(jnp.clip(fwd["x_hat"], 0, 1) - dec["x_hat"])))
log(f"codec round trip: {nbytes} bytes, max|dec - fwd| = {diff} "
    f"({time.time()-t0:.1f}s)")
assert diff == 0.0, diff

# Second compress on the SAME codec must not retrace (cached jits) — time it.
t0 = time.time()
enc2 = codec.compress(x, encode_method="encode")
dt = time.time() - t0
log(f"second compress (cached jits): {dt:.2f}s")
assert enc2["strings"][0][0] == enc["strings"][0][0]
assert dt < 2.0, f"second compress took {dt:.2f}s — per-call retrace?"

# 3. Truncated bitstream: garbage decode but no crash.
bad = [[enc["strings"][0][0][: max(1, nbytes // 4)]], enc["strings"][1]]
try:
    _ = codec.decompress(bad, enc["shape"])
    log("truncated bitstream: decoded (garbage) without crash")
except AssertionError:
    raise
except Exception as e:
    log(f"truncated bitstream raised {type(e).__name__} (acceptable, no crash)")

print("E2E-OK")
