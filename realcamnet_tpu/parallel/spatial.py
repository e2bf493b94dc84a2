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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _exchange_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Concat `halo` rows from the previous/next shard onto this band.

    x: (B, H_loc, W, C) local band. Returns (B, H_loc + 2*halo, W, C); the
    first/last shards receive zero rows on the outside (matching zero-pad
    semantics of the unsharded model's borders).
    """
    n = jax.lax.axis_size(axis_name)
    assert halo <= x.shape[1], (
        f"halo {halo} exceeds the local band of {x.shape[1]} rows")
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


def make_staged_halo_isp_forward(model, params, mesh: Mesh,
                                 out_scale: int = 2) -> Callable:
    """Per-stage halo-exchange LiteISP forward (VERDICT r3 next #4): H stays
    sharded over mesh axis 'spatial' END TO END; each stage exchanges only
    its own receptive-field halo (a few rows at that stage's scale) via
    `ppermute` inside the model (`LiteISPNet.__call__(halo_axis=...)`),
    instead of whole-net halos up front (`make_tiled_isp_forward`, which
    recomputes ~2*rf rows of every stage per shard). Channel-attention
    pooling is made exact with band-cropped `pmean`; the tiny 1/8-scale
    middle runs replicated after an `all_gather`.

    Per-shard compute overhead is O(sum_s r_s * W_s) exchanged rows instead
    of O(rf * W) recomputed rows — the ≥80%-efficiency scaler projected in
    artifacts/scaling_projection_r03.json.

    raw/coord sharded on H; cond replicated (global color prior is exact).
    """
    # LiteISP always upsamples 2x (PixelShuffle tail); the parameter exists
    # for signature parity with make_tiled_isp_forward, which uses it to
    # scale halo cropping.
    assert out_scale == 2, "LiteISP staged-halo forward is 2x-output only"
    axis = "spatial"

    def local_fn(p, raw, cond, coord):
        return model.apply(p, raw, cond, coord, halo_axis=axis)

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(None, axis, None, None), P(),
                      P(None, axis, None, None)),
            out_specs=P(None, axis, None, None),
        )
    )

    def wrapper(raw, cond, coord):
        n = mesh.shape[axis]
        assert raw.shape[1] % (16 * n) == 0, (
            f"H={raw.shape[1]} must be divisible by 16*spatial={16 * n}")
        sh = NamedSharding(mesh, P(None, axis, None, None))
        repl = NamedSharding(mesh, P())
        return fn(jax.device_put(params, repl), jax.device_put(raw, sh),
                  jax.device_put(cond, repl), jax.device_put(coord, sh))

    return wrapper


def liteisp_rf_radius(n_blocks: int = 4, levels: int = 3) -> int:
    """Receptive-field radius (input rows) of the LiteISPNet trunk
    (`LiteISP.py:1710-2035`): head+mod+down convs, DWT pyramid, middle,
    up path. Used to size exact tiling halos; rounded up to 16."""
    per_rcag = 2 * n_blocks + 1  # RCABs (2 convs) + tail conv
    r, s = 0, 1
    r += 1 + 2                       # head conv + Res_GFM (2 convs)
    r += (1 + per_rcag + 1) * s + s  # down1 convs + DWT
    s *= 2
    for _ in range(levels - 1):      # down2, down3
        r += 2 * s                   # modulation
        r += (1 + per_rcag) * s + s  # conv0 + rcag + DWT
        s *= 2
    r += 2 * s                       # mod4
    r += (1 + 2 * per_rcag + 1) * s  # mid convs + 2 rcags
    for _ in range(levels):          # up3..1
        r += s                       # IWT
        s //= 2
        r += (per_rcag + 1) * s      # rcag + conv
    r += 2                           # tail convs
    return -(-r // 16) * 16


def make_tiled_forward_exact(apply_fn: Callable, mesh: Mesh, halo: int,
                             align: int = 16) -> Callable:
    """Exact H-tiled inference: inputs replicated, each 'spatial' shard runs
    `apply_fn` on its clamped window [i*band - halo, ...) of the frame and
    emits its band's output rows (any output/input row ratio); results
    concatenate to EXACTLY the unsharded forward when halo >= the
    receptive-field radius.

    Unlike halo exchange with zero fill, clamped windows keep the frame's
    true borders inside the first/last shard's window, so the model's own
    per-layer padding applies there and even border rows match bit-for-bit
    (modulo fp reduction order). For window-attention models pass
    align = window * latent_stride (e.g. 8*32 = 256 for the joint codec) so
    every window grid coincides with the full-frame partition; halo and
    H/n_shards must be multiples of `align`.

    apply_fn(raw_win, cond, coord_win) -> (B, rows', W', C') output.
    """
    axis = "spatial"

    def local_fn(raw, cond, coord):
        n = jax.lax.axis_size(axis)
        i = jax.lax.axis_index(axis)
        h = raw.shape[1]
        band = h // n
        assert band % align == 0 and halo % align == 0, (band, halo, align)
        win = band + 2 * halo
        assert win <= h, f"halo {halo} too large for H={h} over {n} shards"
        start = jnp.clip(i * band - halo, 0, h - win)
        raw_w = jax.lax.dynamic_slice_in_dim(raw, start, win, 1)
        coord_w = jax.lax.dynamic_slice_in_dim(coord, start, win, 1)
        out = apply_fn(raw_w, cond, coord_w)
        off = ((i * band - start) * out.shape[1]) // win
        rows = (band * out.shape[1]) // win
        return jax.lax.dynamic_slice_in_dim(out, off, rows, 1)

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(None, axis, None, None),
        )
    )

    def wrapper(raw, cond, coord):
        repl = NamedSharding(mesh, P())
        return fn(jax.device_put(raw, repl), jax.device_put(cond, repl),
                  jax.device_put(coord, repl))

    return wrapper


def tile_windows(h: int, n: int, halo: int, align: int = 16):
    """Window plan for H rows over n shards: returns (band, win, starts,
    offsets) with starts[i] the clamped window origin of shard i and
    offsets[i] the row of shard i's band within its window. Same clamping
    rule as `make_tiled_forward_exact`, shared so host and device agree."""
    band = h // n
    assert band * n == h and band % align == 0 and halo % align == 0, (
        h, n, halo, align)
    win = band + 2 * halo
    assert win <= h, f"halo {halo} too large for H={h} over {n} shards"
    starts = [min(max(i * band - halo, 0), h - win) for i in range(n)]
    return band, win, starts, [i * band - starts[i] for i in range(n)]


def make_tiled_forward_sharded(apply_fn: Callable, mesh: Mesh, halo: int,
                               align: int = 16) -> Callable:
    """Memory-scalable exact H-tiled inference: each shard holds ONLY its
    clamped window (device memory O(band + 2*halo) rows per chip, not
    O(frame)), unlike `make_tiled_forward_exact` which replicates the whole
    frame to every device.

    The wrapper slices the n overlapping windows on the host (numpy views,
    no device transfer of the full frame to every chip) and stacks them on a
    leading axis sharded over 'spatial': device i receives exactly windows
    [i]. In a multi-host deployment each process feeds its own windows via
    `jax.make_array_from_process_local_data` with the same sharding — the
    plan (`tile_windows`) is deterministic on (H, n, halo, align).

    Window contents and band extraction are identical to
    `make_tiled_forward_exact`, so the output equals the unsharded forward
    whenever halo >= the receptive-field radius (and `align` keeps window
    grids coincident for window-attention models).

    apply_fn(raw_win, cond, coord_win) -> (B, rows', W', C').
    """
    axis = "spatial"

    def local_fn(raw_w, cond, coord_w, off):
        # raw_w: (1, B, win, W, C) this shard's window; off: (1,) int32.
        out = apply_fn(raw_w[0], cond, coord_w[0])
        win = raw_w.shape[2]
        band = win - 2 * halo
        off_out = (off[0] * out.shape[1]) // win
        rows = (band * out.shape[1]) // win
        return jax.lax.dynamic_slice_in_dim(out, off_out, rows, 1)[None]

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis), P(), P(axis), P(axis)),
            out_specs=P(axis),
        )
    )

    def wrapper(raw, cond, coord):
        n = mesh.shape[axis]
        h = raw.shape[1]
        band, win, starts, offs = tile_windows(h, n, halo, align)
        raw_h = np.asarray(raw)
        coord_h = np.asarray(coord)
        raw_w = np.stack([raw_h[:, s : s + win] for s in starts])
        coord_w = np.stack([coord_h[:, s : s + win] for s in starts])
        shard = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        out = fn(jax.device_put(raw_w, shard), jax.device_put(cond, repl),
                 jax.device_put(coord_w, shard),
                 jax.device_put(np.asarray(offs, np.int32), shard))
        # (n, B, rows', W', C') -> (B, n*rows', W', C')
        o = out.shape
        return jnp.moveaxis(out, 0, 1).reshape(o[1], o[0] * o[2], o[3], o[4])

    return wrapper
