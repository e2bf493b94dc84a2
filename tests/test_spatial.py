"""Spatial-parallel tiled inference tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.models.liteisp import LiteISPNet
from realcamnet_tpu.parallel.mesh import create_mesh
from realcamnet_tpu.parallel.spatial import make_tiled_isp_forward

pytestmark = pytest.mark.slow  # compile-heavy; run with -m slow or no -m filter



def small_isp():
    # Narrow LiteISP so the CPU-mesh test stays cheap; same topology/RF
    # structure as the flagship.
    return LiteISPNet(ch_1=8, ch_2=16, ch_3=16, n_blocks=1, cond_c=8,
                      use_gfm=True, use_lsc=True)


def test_tiled_matches_unsharded_interior():
    """Halo-exchange path: with halo >= the receptive-field radius, interior
    rows (away from the frame's top/bottom borders, where zero-filled halos
    legitimately differ from the model's own per-layer border padding) match
    the unsharded forward tightly."""
    from realcamnet_tpu.parallel.spatial import liteisp_rf_radius

    mesh = create_mesh(data=2, spatial=4)
    model = small_isp()
    halo = liteisp_rf_radius(n_blocks=1)
    band = 192
    h, w = 4 * band, 48
    raw = jax.random.uniform(jax.random.key(0), (1, h, w, 4))
    cond = jax.random.uniform(jax.random.key(1), (1, 64, 64, 4))
    coord = jax.random.uniform(jax.random.key(2), (1, h, w, 2))
    params = model.init(jax.random.key(3), raw, cond, coord)

    full = model.apply(params, raw, cond, coord)
    tiled_fn = make_tiled_isp_forward(model, params, mesh, halo=halo)
    tiled = tiled_fn(raw, cond, coord)

    assert tiled.shape == full.shape == (1, 2 * h, 2 * w, 3)
    a = np.asarray(full)
    b = np.asarray(jax.device_get(tiled))
    # All rows whose receptive field avoids the frame borders are exact.
    inner = slice(2 * halo, 2 * (h - halo))
    np.testing.assert_allclose(a[:, inner], b[:, inner], atol=1e-4)


def test_tiled_shape_validation():
    mesh = create_mesh(data=2, spatial=4)
    model = small_isp()
    fn = make_tiled_isp_forward(model, {}, mesh, halo=16)
    with pytest.raises(AssertionError):
        fn(jnp.zeros((1, 100, 48, 4)), jnp.zeros((1, 64, 64, 4)),
           jnp.zeros((1, 100, 48, 2)))


def test_exact_tiled_matches_unsharded_everywhere():
    """Window-clamped tiling with halo >= receptive field is exact,
    including the frame borders (VERDICT round-1 item 4)."""
    from realcamnet_tpu.parallel.spatial import (
        liteisp_rf_radius,
        make_tiled_forward_exact,
    )

    mesh = create_mesh(data=2, spatial=4)
    model = LiteISPNet(ch_1=8, ch_2=16, ch_3=16, n_blocks=1, cond_c=8,
                       use_gfm=True, use_lsc=True)
    halo = liteisp_rf_radius(n_blocks=1)
    band = 128
    h, w = 4 * band, 48
    raw = jax.random.uniform(jax.random.key(0), (1, h, w, 4))
    cond = jax.random.uniform(jax.random.key(1), (1, 64, 64, 4))
    coord = jax.random.uniform(jax.random.key(2), (1, h, w, 2))
    params = model.init(jax.random.key(3), raw, cond, coord)

    full = model.apply(params, raw, cond, coord)
    fn = make_tiled_forward_exact(
        lambda r, c, co: model.apply(params, r, c, co), mesh, halo=halo)
    tiled = fn(raw, cond, coord)
    np.testing.assert_allclose(np.asarray(jax.device_get(tiled)),
                               np.asarray(full), atol=1e-5)


def test_sharded_tiled_matches_exact_and_unsharded():
    """Memory-scalable window-sharded tiler (each device holds only its
    window) equals the full-frame-replicated exact tiler AND the unsharded
    forward (VERDICT r2 item #5)."""
    from realcamnet_tpu.parallel.spatial import (
        liteisp_rf_radius,
        make_tiled_forward_exact,
        make_tiled_forward_sharded,
        tile_windows,
    )

    mesh = create_mesh(data=2, spatial=4)
    model = LiteISPNet(ch_1=8, ch_2=16, ch_3=16, n_blocks=1, cond_c=8,
                       use_gfm=True, use_lsc=True)
    halo = liteisp_rf_radius(n_blocks=1)
    band = 128
    h, w = 4 * band, 48
    raw = jax.random.uniform(jax.random.key(0), (1, h, w, 4))
    cond = jax.random.uniform(jax.random.key(1), (1, 64, 64, 4))
    coord = jax.random.uniform(jax.random.key(2), (1, h, w, 2))
    params = model.init(jax.random.key(3), raw, cond, coord)

    full = np.asarray(model.apply(params, raw, cond, coord))
    apply_fn = lambda r, c, co: model.apply(params, r, c, co)
    sharded = make_tiled_forward_sharded(apply_fn, mesh, halo=halo)(
        raw, cond, coord)
    np.testing.assert_allclose(np.asarray(jax.device_get(sharded)), full,
                               atol=1e-5)
    exact = make_tiled_forward_exact(apply_fn, mesh, halo=halo)(
        raw, cond, coord)
    np.testing.assert_allclose(np.asarray(jax.device_get(sharded)),
                               np.asarray(jax.device_get(exact)), atol=1e-6)


def test_tile_windows_plan():
    from realcamnet_tpu.parallel.spatial import tile_windows

    band, win, starts, offs = tile_windows(1024, 4, halo=128, align=16)
    assert (band, win) == (256, 512)
    assert starts == [0, 128, 384, 512]
    assert offs == [0, 128, 128, 256]
    # Every shard's band sits inside its window.
    for i, (s, o) in enumerate(zip(starts, offs)):
        assert s + o == i * band
        assert o + band <= win


def test_exact_tiled_joint_encoder():
    """Window-aligned tiling of the WMSA joint-codec encoder: shard starts on
    8-window multiples at the latent scale (align=256) keep the Swin window
    grids coincident; interior y rows match the unsharded encode."""
    from realcamnet_tpu.models.raw2bit import RAW2BIT_MODELS
    from realcamnet_tpu.parallel.spatial import make_tiled_forward_exact

    mesh = create_mesh(data=4, spatial=2)
    model = RAW2BIT_MODELS["raw_compression_tcm_final"](
        config=(1, 1, 1, 1, 1, 1), head_dim=(32,) * 6, n=32, m=40)
    h, w = 1024, 256
    raw = jax.random.uniform(jax.random.key(0), (1, h, w, 4))
    coord = jax.random.uniform(jax.random.key(1), (1, h, w, 2))
    params = model.init(jax.random.key(2), raw, raw, coord)

    y_full, _ = model.apply(params, raw, raw, coord, method="encode")

    def enc(r, c, co):
        y, _ = model.apply(params, r, c, co, method="encode")
        return y

    fn = make_tiled_forward_exact(enc, mesh, halo=256, align=256)
    y_tiled = fn(raw, raw, coord)
    assert y_tiled.shape == y_full.shape
    a, b = np.asarray(y_full), np.asarray(jax.device_get(y_tiled))
    # Interior rows (>= halo-covered RF away from shard seams) are exact.
    band_y = y_full.shape[1] // 2
    inner = slice(band_y // 4, 3 * band_y // 4)
    np.testing.assert_allclose(a[:, inner], b[:, inner], atol=1e-4)
    inner2 = slice(band_y + band_y // 4, band_y + 3 * band_y // 4)
    np.testing.assert_allclose(a[:, inner2], b[:, inner2], atol=1e-4)


def test_staged_halo_matches_unsharded_interior():
    """Per-stage halo exchange (VERDICT r3 next #4): H sharded end to end,
    each stage exchanging only its own rf halo; interior rows match the
    unsharded forward tightly, and CA pooling is distributed-exact
    (band-cropped pmean), so the agreement tolerance matches the
    whole-net-halo path's."""
    from realcamnet_tpu.parallel.spatial import make_staged_halo_isp_forward

    mesh = create_mesh(data=2, spatial=4)
    model = small_isp()
    band = 64
    h, w = 4 * band, 48
    raw = jax.random.uniform(jax.random.key(0), (1, h, w, 4))
    cond = jax.random.uniform(jax.random.key(1), (1, 64, 64, 4))
    coord = jax.random.uniform(jax.random.key(2), (1, h, w, 2))
    params = model.init(jax.random.key(3), raw, cond, coord)

    full = model.apply(params, raw, cond, coord)
    staged = make_staged_halo_isp_forward(model, params, mesh)(raw, cond,
                                                               coord)
    assert staged.shape == full.shape == (1, 2 * h, 2 * w, 3)
    a = np.asarray(full)
    b = np.asarray(jax.device_get(staged))
    # Borders: zero-filled halos differ from the model's own frame-edge
    # padding within the total rf; interior must agree tightly.
    from realcamnet_tpu.parallel.spatial import liteisp_rf_radius

    rf = liteisp_rf_radius(n_blocks=1)
    inner = slice(2 * rf, 2 * (h - rf))
    np.testing.assert_allclose(a[:, inner], b[:, inner], atol=1e-4)


def test_staged_halo_default_path_unchanged():
    """halo_axis=None must be byte-identical to the pre-refactor forward."""
    model = small_isp()
    raw = jax.random.uniform(jax.random.key(0), (1, 64, 48, 4))
    cond = jax.random.uniform(jax.random.key(1), (1, 64, 64, 4))
    coord = jax.random.uniform(jax.random.key(2), (1, 64, 48, 2))
    params = model.init(jax.random.key(3), raw, cond, coord)
    out = model.apply(params, raw, cond, coord)
    out2 = model.apply(params, raw, cond, coord, halo_axis=None)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
