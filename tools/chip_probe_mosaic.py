"""Probe what Mosaic accepts on real v5e for manual-DMA + reshape patterns.

Each probe compiles a tiny kernel and reports PASS/FAIL. Single TPU process.
"""

import time
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        log(f"PASS {name}: {jnp.asarray(out).reshape(-1)[:3]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")
        head = [l for l in msg if "Mosaic" in l or "must be aligned" in l
                or "not supported" in l or "Unsupported" in l or "error:" in l]
        log(f"FAIL {name}: {head[:3] if head else msg[:2]}")
        return False


# --- probe A: H-only DMA slice of (1,64,256,48) HBM -> (16,256,48) VMEM ---
def probe_a():
    x = jnp.arange(1 * 64 * 256 * 48, dtype=jnp.bfloat16).reshape(1, 64, 256, 48) * 0 + 1

    def kern(x_hbm, o_ref, xs, sem):
        cp = pltpu.make_async_copy(x_hbm.at[0, pl.ds(8, 16)], xs, sem)
        cp.start()
        cp.wait()
        o_ref[:] = jnp.sum(xs[:].astype(jnp.float32), axis=(0, 1))[None]

    return jax.jit(lambda x: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 48), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 256, 48), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x))(x)


# --- probe B: flattened (H, W*C) DMA with 8-aligned W slices ---
def probe_b():
    c = 48
    x = jnp.ones((1, 64, 256 * c), jnp.bfloat16)

    def kern(x_hbm, o_ref, xs, sem):
        # W window [8, 8+144) in W units -> [8*c, (8+144)*c) flattened
        cp = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(8, 16), pl.ds(8 * c, 144 * c)], xs, sem)
        cp.start()
        cp.wait()
        o_ref[:] = jnp.sum(xs[:].astype(jnp.float32), axis=0)[None, :48]

    return jax.jit(lambda x: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 48), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 144 * c), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x))(x)


# --- probe C: value reshape (16, 144*c) -> (16, 144, c) + dot ---
def probe_c():
    c = 48
    x = jnp.ones((16, 144 * c), jnp.bfloat16)
    w = jnp.ones((c, c), jnp.bfloat16)

    def kern(x_ref, w_ref, o_ref):
        v = x_ref[:].reshape(16, 144, c)
        o_ref[:] = jax.lax.dot_general(
            v[:, 4:132, :], w_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    return jax.jit(lambda x, w: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128, c), jnp.float32),
    )(x, w))(x, w)


# --- probe D: DMA (1,64,256,48) with H slice into flattened scratch via
#     reshaped ref handle (bitcast-free): src sliced on H only, dst 3D, then
#     in-kernel unaligned W read xs[:, 5:133, :] ---
def probe_d():
    x = jnp.ones((1, 64, 256, 48), jnp.bfloat16)

    def kern(x_hbm, o_ref, xs, sem):
        cp = pltpu.make_async_copy(x_hbm.at[0, pl.ds(8, 16)], xs, sem)
        cp.start()
        cp.wait()
        v = xs[:, 5:133, :]
        o_ref[:] = jnp.sum(v.astype(jnp.float32), axis=(0, 1))[None]

    return jax.jit(lambda x: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 48), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 256, 48), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x))(x)


def main():
    log(f"devices: {jax.devices()}")
    probe("A: H-slice DMA, minor C=48", probe_a)
    probe("B: flattened (W*C) DMA, aligned", probe_b)
    probe("C: value reshape (.,W*C)->(.,W,C) + dot", probe_c)
    probe("D: H-slice DMA + unaligned W read", probe_d)


if __name__ == "__main__":
    main()
