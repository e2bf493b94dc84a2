"""Unit tests for the op library: DWT orthogonality, pixel shuffle, pooling,
conv shape semantics, modulation algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.ops.blocks import (
    CALayer,
    Conv2d,
    ConvTranspose2d,
    RCAGroup,
    avg_pool,
    max_pool,
    resize_bilinear,
    upsample_nearest,
)
from realcamnet_tpu.ops.dwt import dwt_forward, dwt_inverse
from realcamnet_tpu.ops.modulation import GFMLayer, ResGFM, SFTLayer
from realcamnet_tpu.ops.pixel import (
    pack_bayer,
    pad_to_multiple,
    pixel_shuffle,
    pixel_unshuffle,
)


class TestDWT:
    def test_roundtrip_identity(self):
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 7))
        y = dwt_forward(x)
        assert y.shape == (2, 8, 8, 28)
        np.testing.assert_allclose(dwt_inverse(y), x, atol=1e-6)

    def test_energy_preserved(self):
        # Haar is orthogonal: ||dwt(x)|| == ||x||.
        x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
        y = dwt_forward(x)
        np.testing.assert_allclose(
            jnp.sum(x**2), jnp.sum(y**2), rtol=1e-6
        )

    def test_ll_is_average(self):
        x = jnp.ones((1, 4, 4, 2))
        y = dwt_forward(x)
        # Constant input: LL = 2*mean = 2, other subbands 0.
        ll = y[..., 0::4]
        np.testing.assert_allclose(ll, 2.0 * jnp.ones_like(ll), atol=1e-6)
        for k in (1, 2, 3):
            np.testing.assert_allclose(y[..., k::4], 0.0, atol=1e-6)

    def test_matches_torch_grouped_conv(self):
        """Bit-compare against the reference's grouped-conv formulation
        (`networks.py:224-236`) computed in numpy."""
        rng = np.random.RandomState(0)
        x = rng.randn(1, 8, 8, 3).astype(np.float32)
        got = np.asarray(dwt_forward(jnp.asarray(x)))
        filters = np.array(
            [[[0.5, 0.5], [0.5, 0.5]],
             [[0.5, 0.5], [-0.5, -0.5]],
             [[0.5, -0.5], [0.5, -0.5]],
             [[0.5, -0.5], [-0.5, 0.5]]], dtype=np.float32)
        want = np.zeros((1, 4, 4, 12), np.float32)
        for c in range(3):
            for k in range(4):
                for i in range(4):
                    for j in range(4):
                        patch = x[0, 2 * i : 2 * i + 2, 2 * j : 2 * j + 2, c]
                        want[0, i, j, 4 * c + k] = np.sum(patch * filters[k])
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPixel:
    def test_shuffle_unshuffle_roundtrip(self):
        x = jax.random.normal(jax.random.key(0), (2, 4, 6, 12))
        y = pixel_shuffle(x, 2)
        assert y.shape == (2, 8, 12, 3)
        np.testing.assert_allclose(pixel_unshuffle(y, 2), x)

    def test_shuffle_matches_torch_layout(self):
        # torch: out[h*r+i, w*r+j, co] = in[h, w, co*r^2 + i*r + j]
        r, c = 2, 3
        x = jnp.arange(1 * 1 * 1 * c * r * r, dtype=jnp.float32).reshape(1, 1, 1, c * r * r)
        y = pixel_shuffle(x, r)
        for co in range(c):
            for i in range(r):
                for j in range(r):
                    assert y[0, i, j, co] == x[0, 0, 0, co * r * r + i * r + j]

    def test_pack_bayer(self):
        raw = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        packed = pack_bayer(raw)
        assert packed.shape == (1, 2, 2, 4)
        # Plane 0 = top-left of each 2x2.
        np.testing.assert_allclose(packed[0, :, :, 0], [[0, 2], [8, 10]])

    def test_pad_to_multiple(self):
        x = jnp.ones((1, 30, 37, 4))
        p, (h, w) = pad_to_multiple(x, 16)
        assert p.shape == (1, 32, 48, 4)
        assert (h, w) == (30, 37)


class TestConvShapes:
    def test_conv_stride2_matches_torch(self):
        # torch Conv2d(k=3,s=2,p=1): H -> floor((H-1)/2)+1.
        m = Conv2d(8, 3, 2, 1)
        for h in (16, 17):
            x = jnp.zeros((1, h, h, 4))
            y, _ = m.init_with_output(jax.random.key(0), x)
            want = (h - 1) // 2 + 1
            assert y.shape == (1, want, want, 8)

    def test_conv_k2s2(self):
        # torch Conv2d(k=2,s=2,p=0): H -> H//2.
        m = Conv2d(8, 2, 2, 0)
        x = jnp.zeros((1, 16, 16, 4))
        y, _ = m.init_with_output(jax.random.key(0), x)
        assert y.shape == (1, 8, 8, 8)

    def test_conv_transpose_k2s2(self):
        m = ConvTranspose2d(4, 2, 2)
        x = jnp.zeros((1, 8, 8, 8))
        y, _ = m.init_with_output(jax.random.key(0), x)
        assert y.shape == (1, 16, 16, 4)

    def test_avg_pool_torch_semantics(self):
        # AvgPool2d(3, stride=2, padding=1, count_include_pad=True) on ones:
        # corner windows include 4 padded zeros -> 5/9.
        x = jnp.ones((1, 8, 8, 1))
        y = avg_pool(x, 3, 2, 1, count_include_pad=True)
        assert y.shape == (1, 4, 4, 1)
        np.testing.assert_allclose(y[0, 0, 0, 0], 4.0 / 9.0, rtol=1e-6)
        np.testing.assert_allclose(y[0, 1, 1, 0], 1.0, rtol=1e-6)

    def test_max_pool(self):
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        y = max_pool(x, 2, 2, 0)
        np.testing.assert_allclose(y[0, :, :, 0], [[5, 7], [13, 15]])

    def test_resize_bilinear_align_corners(self):
        x = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
        y = resize_bilinear(x, (3, 3), align_corners=True)
        np.testing.assert_allclose(y[0, :, :, 0],
                                   [[0, 0.5, 1], [1, 1.5, 2], [2, 2.5, 3]],
                                   atol=1e-6)


class TestModulation:
    def test_gfm_algebra(self):
        """GFM: out = x*scale + shift + x; zero-param net -> identity."""
        m = GFMLayer(out_nc=8, nf=4)
        x = jax.random.normal(jax.random.key(0), (2, 4, 4, 8))
        vec = jnp.zeros((2, 16))
        params = m.init(jax.random.key(1), x, vec)
        zero = jax.tree.map(jnp.zeros_like, params)
        out = m.apply(zero, x, vec)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_sft_identity_at_zero(self):
        """SFT: out = x*(scale+1)+shift; zero params -> identity."""
        m = SFTLayer(out_nc=8, nf=4)
        x = jax.random.normal(jax.random.key(0), (2, 4, 4, 8))
        cond = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
        params = m.init(jax.random.key(2), x, cond)
        zero = jax.tree.map(jnp.zeros_like, params)
        np.testing.assert_allclose(m.apply(zero, x, cond), x, atol=1e-6)

    def test_res_gfm_shapes(self):
        m = ResGFM(chan=16, nf=32)
        x = jnp.ones((1, 8, 8, 16))
        vec = jnp.ones((1, 24))
        y, _ = m.init_with_output(jax.random.key(0), x, vec)
        assert y.shape == x.shape

    def test_ca_layer_gate_range(self):
        m = CALayer(16, 4)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
        y, _ = m.init_with_output(jax.random.key(1), x)
        assert y.shape == x.shape

    def test_rcagroup_residual(self):
        m = RCAGroup(8, nb=2)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 8))
        params = m.init(jax.random.key(1), x)
        zero = jax.tree.map(jnp.zeros_like, params)
        # All-zero params: every conv outputs 0, CA gate sigmoid(0)=0.5
        # multiplies 0; residuals pass x through unchanged.
        np.testing.assert_allclose(m.apply(zero, x), x, atol=1e-6)
