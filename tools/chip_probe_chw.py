"""Probe Mosaic support for the CHW-layout fused-RCAB kernel building blocks.

Layout: x stored (C=48, H, W=1920) — W is the lane dim (15x128, no padding),
H the sublane dim, C a major dim. Probes:
  E: manual DMA of an H-slice (8-aligned) of (48, 1088, 1920) HBM -> VMEM
  F: lane shift of a (48, 24, 1920) VMEM value (W halo via shift+zero-fill)
  G: per-row matmul w(48,48) @ xrow(48, 1920) -> (48, 1920)
  H: stacked-tap matmul wcat(48, 432) @ xcat(432, 1920)
  I: fori_loop over rows writing out_ref rows
  J: BlockSpec auto-tiling on NHWC C=48 input (does pipelined fetch work?)
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe(name, fn, alarm=150):
    import signal

    def _handler(signum, frame):
        raise TimeoutError(f"probe exceeded {alarm}s")

    signal.signal(signal.SIGALRM, _handler)
    signal.alarm(alarm)
    try:
        out = fn()
        jax.block_until_ready(out)
        signal.alarm(0)
        log(f"PASS {name}: {jnp.asarray(out).reshape(-1)[:3]}")
        return True
    except Exception as e:
        signal.alarm(0)
        msg = str(e).split("\n")
        head = [l for l in msg if "Mosaic" in l or "aligned" in l
                or "not supported" in l or "Unsupported" in l or "error:" in l
                or "NotImplemented" in l]
        log(f"FAIL {name}: {head[:3] if head else msg[:2]}")
        return False


def probe_e():
    x = jnp.ones((48, 1088, 1920), jnp.bfloat16)

    def kern(x_hbm, o_ref, xs, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * 8, 24), :], xs, sem)
        cp.start()
        cp.wait()
        o_ref[0] = jnp.sum(xs[:].astype(jnp.float32))

    return jax.jit(lambda x: pl.pallas_call(
        kern,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((48, 24, 1920), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x))(x)


def probe_f():
    x = jnp.ones((48, 24, 1920), jnp.bfloat16)

    def kern(x_ref, o_ref):
        v = x_ref[:]
        left = jnp.pad(v[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
        right = jnp.pad(v[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
        o_ref[:] = (v + left + right)

    return jax.jit(lambda x: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((48, 24, 1920), jnp.bfloat16),
    )(x))(x)


def probe_g():
    x = jnp.ones((48, 24, 1920), jnp.bfloat16)
    w = jnp.ones((48, 48), jnp.bfloat16)

    def kern(x_ref, w_ref, o_ref):
        row = x_ref[:, 4, :]
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], row, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    return jax.jit(lambda x, w: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((48, 1920), jnp.bfloat16),
    )(x, w))(x, w)


def probe_h():
    x = jnp.ones((432, 1920), jnp.bfloat16)
    w = jnp.ones((48, 432), jnp.bfloat16)

    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], x_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    return jax.jit(lambda x, w: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((48, 1920), jnp.bfloat16),
    )(x, w))(x, w)


def probe_i():
    x = jnp.ones((48, 24, 1920), jnp.bfloat16)
    w = jnp.ones((48, 48), jnp.bfloat16)

    def kern(x_ref, w_ref, o_ref):
        def body(r, _):
            acc = jnp.zeros((48, 1920), jnp.float32)
            for di in range(3):
                acc = acc + jax.lax.dot_general(
                    w_ref[:], x_ref[:, r + di, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[:, r, :] = acc.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, 8, body, 0)

    return jax.jit(lambda x, w: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((48, 8, 1920), jnp.bfloat16),
    )(x, w))(x, w)


def probe_j():
    x = jnp.ones((1, 64, 1920, 48), jnp.bfloat16)

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    return jax.jit(lambda x: pl.pallas_call(
        kern,
        grid=(8,),
        in_specs=[pl.BlockSpec((1, 8, 1920, 48), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 1920, 48), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 64, 1920, 48), jnp.bfloat16),
    )(x))(x)


def main():
    log(f"devices: {jax.devices()}")
    probe("E: CHW H-slice DMA (48,1088,1920)", probe_e)
    probe("F: lane shift (48,24,1920)", probe_f)
    probe("G: row matmul (48,48)@(48,1920)", probe_g)
    probe("H: stacked matmul (48,432)@(432,1920)", probe_h)
    probe("I: fori_loop rows + 3-tap dots", probe_i)
    probe("J: BlockSpec auto-tiling NHWC C=48", probe_j)


if __name__ == "__main__":
    main()
