"""Canonical end-to-end verify drive on the real chip (see the verify skill):

1. ISP on an odd-size Bayer frame: pack -> pad16 -> jit forward -> crop.
2. Tiny TCM real-bitstream round trip: decompress(compress(x)) must equal
   the ENCODER's decoder-replay oracle EXACTLY (compress(return_xhat=True)
   replays the decoder's own executables on the true symbols — r5 staged
   encode), and stay within a small tolerance of the eval forward's x_hat
   (the forward's mu/sigma come from a DIFFERENT XLA program; exact
   agreement with it is a numerics accident, not the codec contract).
   A second compress() on the same ChARMCodec must be fast (catches
   per-call retraces, the r3 codec bug class).
3. wrANS device-decoded path: decompress_tpu(compress_tpu(x)) must equal
   the same oracle exactly, with intact lane states.
4. Truncated bitstream: decodes garbage or raises cleanly, never crashes.

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
enc = codec.compress(x, encode_method="encode", return_xhat=True)
nbytes = sum(len(s[0]) for s in enc["strings"])
dec = codec.decompress(enc["strings"], enc["shape"])
oracle = np.asarray(jax.device_get(enc["x_hat"]))
diff = float(np.max(np.abs(oracle - np.asarray(jax.device_get(dec["x_hat"])))))
fwd = jax.jit(lambda p, xx: tcm.apply(p, xx))(tp, x)
fdiff = float(jnp.max(jnp.abs(jnp.clip(fwd["x_hat"], 0, 1) - dec["x_hat"])))
log(f"codec round trip: {nbytes} bytes, max|dec - oracle| = {diff}, "
    f"max|dec - fwd| = {fdiff} ({time.time()-t0:.1f}s)")
assert diff == 0.0, diff       # the codec contract: decode == encoder oracle
assert fdiff < 0.05, fdiff     # forward is a different program: ulp-level
# mu differences shift a few hard-rounding decisions by one quantization bin

# Second compress on the SAME codec must not retrace (cached jits) — time it.
t0 = time.time()
enc2 = codec.compress(x, encode_method="encode")
dt = time.time() - t0
log(f"second compress (cached jits): {dt:.2f}s")
assert enc2["strings"][0][0] == enc["strings"][0][0]
assert dt < 2.0, f"second compress took {dt:.2f}s — per-call retrace?"

# 3. wrANS device-decoded path: same oracle, exact, lane states intact.
t0 = time.time()
encw = codec.compress_tpu(x, encode_method="encode", num_lanes=64,
                          return_xhat=True)
decw = codec.decompress_tpu(encw["blob"], encw["shape"], num_lanes=64,
                            check_states=True)
wdiff = float(np.max(np.abs(np.asarray(jax.device_get(encw["x_hat"]))
                            - np.asarray(jax.device_get(decw["x_hat"])))))
log(f"wrANS round trip: {len(encw['blob'])} bytes, max|dec - oracle| = "
    f"{wdiff} ({time.time()-t0:.1f}s)")
assert wdiff == 0.0, wdiff

# 4. Truncated bitstream: garbage decode but no crash.
bad = [[enc["strings"][0][0][: max(1, nbytes // 4)]], enc["strings"][1]]
try:
    _ = codec.decompress(bad, enc["shape"])
    log("truncated bitstream: decoded (garbage) without crash")
except AssertionError:
    raise
except Exception as e:
    log(f"truncated bitstream raised {type(e).__name__} (acceptable, no crash)")

print("E2E-OK")
