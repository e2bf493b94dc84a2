"""Spatial-parallel tiled inference: shard the H dimension of large frames
over the mesh 'spatial' axis with halo exchange.

The image-domain analog of sequence parallelism (SURVEY.md §5.7): 4K+ RAW
frames exceed what one chip should chew per step, so each device processes a
horizontal band plus `halo` rows exchanged from its neighbors via
`ppermute` over ICI, runs the full network on the padded band, and crops the
output back. The result equals the unsharded forward wherever the halo
covers the network's receptive field; the global color-prior branch sees the
(replicated) full condition image so the GFM vector is exact.

Bands and halos must be multiples of 16 (the ISP's downsample factor,
reference precedent `LiteISP.py:84-105`).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _exchange_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Concat `halo` rows from the previous/next shard onto this band.

    x: (B, H_loc, W, C) local band. Returns (B, H_loc + 2*halo, W, C); the
    first/last shards receive zero rows on the outside (matching zero-pad
    semantics of the unsharded model's borders).
    """
    n = jax.lax.axis_size(axis_name)
    down = [(i, (i + 1) % n) for i in range(n)]  # send my bottom rows down
    up = [(i, (i - 1) % n) for i in range(n)]    # send my top rows up
    from_above = jax.lax.ppermute(x[:, -halo:], axis_name, down)
    from_below = jax.lax.ppermute(x[:, :halo], axis_name, up)
    idx = jax.lax.axis_index(axis_name)
    zeros = jnp.zeros_like(from_above)
    from_above = jnp.where(idx == 0, zeros, from_above)
    from_below = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=1)


def make_tiled_isp_forward(model, params, mesh: Mesh, halo: int = 48,
                           out_scale: int = 2) -> Callable:
    """Returns f(raw, cond, coord) -> sRGB, H-sharded over mesh axis 'spatial'.

    raw/coord are sharded on H; cond is replicated (it is the global color
    image, so the GFM vector is computed exactly on every shard). Output is
    sharded on H at `out_scale` x resolution.
    """
    assert halo % 16 == 0, "halo must be a multiple of 16"
    axis = "spatial"

    def local_fn(raw, cond, coord):
        # raw: (B, H_loc, W, 4) local band (leading dims unsharded inside
        # shard_map refer to this device's block).
        raw_p = _exchange_halo(raw, halo, axis)
        coord_p = _exchange_halo(coord, halo, axis)
        out = model.apply(params, raw_p, cond, coord_p)
        s = out_scale
        return out[:, s * halo : out.shape[1] - s * halo]

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(None, axis, None, None), P(), P(None, axis, None, None)),
            out_specs=P(None, axis, None, None),
        )
    )

    def wrapper(raw, cond, coord):
        n = mesh.shape[axis]
        assert raw.shape[1] % (16 * n) == 0, (
            f"H={raw.shape[1]} must be divisible by 16*spatial={16 * n}"
        )
        sh = NamedSharding(mesh, P(None, axis, None, None))
        repl = NamedSharding(mesh, P())
        raw = jax.device_put(raw, sh)
        cond = jax.device_put(cond, repl)
        coord = jax.device_put(coord, sh)
        return fn(raw, cond, coord)

    return wrapper
