"""BHCW-layout Pallas conv3x3 / fused RCAGroup vs XLA (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.ops.blocks import RCAGroup
from realcamnet_tpu.ops.pallas_conv import (
    _bhcw_ref_conv,
    conv3x3_bhcw,
    fused_rcag_bhcw,
)

pytestmark = pytest.mark.slow  # compile-heavy; run with -m slow or no -m filter



def _rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("h,w,tile_h", [(16, 256, 8), (8, 128, 8),
                                        (32, 96, 16)])
def test_conv_matches_ref(h, w, tile_h):
    cin, cout = 8, 16
    x = _rand(0, 2, h, cin, w)
    wk = _rand(1, 3, 3, cin, cout) * 0.2
    b = _rand(2, cout) * 0.1
    out = conv3x3_bhcw(x, wk, b, tile_h=tile_h, interpret=True)
    ref = _bhcw_ref_conv(x, wk, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_conv_fusions_match_ref():
    cin, cout, h, w = 8, 8, 16, 128
    x = _rand(3, 1, h, cin, w)
    wk = _rand(4, 3, 3, cin, cout) * 0.2
    b = _rand(5, cout) * 0.1
    res_prev = _rand(6, 1, h, cin, w)
    gate = jax.nn.sigmoid(_rand(7, 1, cin))
    add = _rand(8, 1, h, cout, w)
    out, xin, sums = conv3x3_bhcw(
        x, wk, b, res_prev=res_prev, gate=gate, add=add, relu=True,
        emit_xin=True, emit_sums=True, tile_h=8, interpret=True)
    ref, rxin, rsums = _bhcw_ref_conv(
        x, wk, b, res_prev=res_prev, gate=gate, add=add, relu=True,
        emit_xin=True, emit_sums=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(xin), np.asarray(rxin), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(rsums),
                               atol=2e-3)


def test_conv_fallback_paths():
    # Odd channels and odd H fall back to the XLA reference silently.
    x = _rand(9, 1, 7, 12, 32)
    wk = _rand(10, 3, 3, 12, 12) * 0.2
    b = _rand(11, 12) * 0.1
    out = conv3x3_bhcw(x, wk, b, interpret=True)
    ref = _bhcw_ref_conv(x, wk, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_rcag_matches_flax_group():
    c, nb = 8, 3
    x = _rand(12, 1, 16, 16, c)
    mod = RCAGroup(channels=c, nb=nb, reduction=4)
    params = mod.init(jax.random.key(0), x)
    want = mod.apply(params, x)
    xb = jnp.transpose(x, (0, 1, 3, 2))
    got = fused_rcag_bhcw(params["params"], xb, nb, 8, True)
    np.testing.assert_allclose(np.asarray(jnp.transpose(got, (0, 1, 3, 2))),
                               np.asarray(want), atol=1e-4)


def test_rcagroup_bhcw_flag():
    c, nb = 8, 2
    x = _rand(13, 1, 16, 16, c)
    ref_mod = RCAGroup(channels=c, nb=nb, reduction=4)
    params = ref_mod.init(jax.random.key(1), x)
    want = ref_mod.apply(params, x)
    got = RCAGroup(channels=c, nb=nb, reduction=4, fused="bhcw").apply(
        params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_rcag_grads_match_ref():
    c, nb = 8, 2
    x = _rand(14, 1, 8, 8, c)
    mod = RCAGroup(channels=c, nb=nb, reduction=4)
    params = mod.init(jax.random.key(2), x)

    def loss_ref(p, x_):
        return jnp.sum(mod.apply(p, x_) ** 2)

    def loss_fused(p, x_):
        xb = jnp.transpose(x_, (0, 1, 3, 2))
        o = fused_rcag_bhcw(p["params"], xb, nb, 8, True)
        return jnp.sum(o ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


class TestCodecEpilogues:
    """r4 kernel extensions: lrelu epilogue + post-activation add, and the
    fused codec conv-half helpers (ops/pallas_conv.py, VERDICT r3 next #1)."""

    def test_lrelu_and_add_post_match_ref(self):
        x = _rand(20, 1, 16, 8, 128)
        w = _rand(21, 3, 3, 8, 8) * 0.2
        b = _rand(22, 8) * 0.1
        add = _rand(23, 1, 16, 8, 128)
        for kw in ({"lrelu": 0.01}, {"lrelu": 0.2, "add": add},
                   {"lrelu": 0.01, "add": add, "add_post": True},
                   {"relu": True, "add": add, "add_post": True}):
            out = conv3x3_bhcw(x, w, b, interpret=True, **kw)
            ref = _bhcw_ref_conv(x, w, b, **kw)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5, err_msg=str(kw))

    def test_fused_residual_block_matches_module(self):
        from realcamnet_tpu.ops.codec_layers import ResidualBlock
        from realcamnet_tpu.ops.pallas_conv import fused_residual_block_bhcw

        x = _rand(30, 1, 16, 64, 8)
        mod = ResidualBlock(8)
        p = mod.init(jax.random.key(3), x)
        ref = mod.apply(p, x)
        xb = jnp.transpose(x, (0, 1, 3, 2))
        out = fused_residual_block_bhcw(p["params"], xb, interpret=True)
        np.testing.assert_allclose(np.asarray(jnp.transpose(out, (0, 1, 3, 2))),
                                   np.asarray(ref), atol=1e-5)

    def test_fused_residual_block_ca_matches_module(self):
        from realcamnet_tpu.models.raw2bit import ResidualBlockWithCA
        from realcamnet_tpu.ops.pallas_conv import fused_residual_block_ca_bhcw

        x = _rand(31, 1, 16, 64, 8)
        mod = ResidualBlockWithCA(8, reduction=4)
        p = mod.init(jax.random.key(4), x)
        ref = mod.apply(p, x)
        xb = jnp.transpose(x, (0, 1, 3, 2))
        out = fused_residual_block_ca_bhcw(p["params"], xb, interpret=True)
        np.testing.assert_allclose(np.asarray(jnp.transpose(out, (0, 1, 3, 2))),
                                   np.asarray(ref), atol=1e-5)

    def test_fused_sft_matches_module(self):
        from realcamnet_tpu.ops.modulation import SpatialFeatureTransform
        from realcamnet_tpu.ops.pallas_conv import fused_sft_bhcw

        x = _rand(32, 1, 16, 64, 8)
        cond = _rand(33, 1, 16, 64, 8)
        mod = SpatialFeatureTransform(8, residual=True)
        p = mod.init(jax.random.key(5), x, cond)
        ref = mod.apply(p, x, cond)
        xb = jnp.transpose(x, (0, 1, 3, 2))
        cb = jnp.transpose(cond, (0, 1, 3, 2))
        out = fused_sft_bhcw(p["params"], xb, cb, residual=True,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(jnp.transpose(out, (0, 1, 3, 2))),
                                   np.asarray(ref), atol=1e-5)

    def test_fused_helpers_grads_match(self):
        from realcamnet_tpu.ops.codec_layers import ResidualBlock
        from realcamnet_tpu.ops.pallas_conv import fused_residual_block_bhcw

        x = _rand(34, 1, 16, 64, 8)
        mod = ResidualBlock(8)
        p = mod.init(jax.random.key(6), x)

        def loss_ref(pp, x_):
            return jnp.sum(mod.apply(pp, x_) ** 2)

        def loss_fused(pp, x_):
            xb = jnp.transpose(x_, (0, 1, 3, 2))
            return jnp.sum(fused_residual_block_bhcw(pp["params"], xb,
                                                     interpret=True) ** 2)

        gr = jax.grad(loss_ref, argnums=(0, 1))(p, x)
        gf = jax.grad(loss_fused, argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)


class TestPairKernel:
    """Paired RCAB kernel (r4): conv1+relu+conv2 in one pallas call, mid
    activation in VMEM (ISP roofline item, VERDICT r3 next #3)."""

    def test_pair_matches_two_convs(self):
        from realcamnet_tpu.ops.pallas_conv import conv3x3_pair_bhcw

        x = _rand(40, 1, 16, 8, 256)
        w1 = _rand(41, 3, 3, 8, 8) * 0.3
        b1 = _rand(42, 8) * 0.1
        w2 = _rand(43, 3, 3, 8, 8) * 0.3
        b2 = _rand(44, 8) * 0.1
        res = _rand(45, 1, 16, 8, 256)
        gate = jnp.abs(_rand(46, 1, 8))
        h1, xin_r = _bhcw_ref_conv(x, w1, b1, res_prev=res, gate=gate,
                                   relu=True, emit_xin=True)
        ref, sums_r = _bhcw_ref_conv(h1, w2, b2, emit_sums=True)
        out, xin, sums = conv3x3_pair_bhcw(
            x, w1, b1, w2, b2, res_prev=res, gate=gate, emit_xin=True,
            emit_sums=True, tile_h=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(xin), np.asarray(xin_r),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(sums), np.asarray(sums_r),
                                   rtol=1e-4, atol=1e-3)

    def test_rcag_pair_matches_module(self):
        from realcamnet_tpu.ops.pallas_conv import fused_rcag_pair_bhcw

        c, nb = 8, 3
        x = _rand(47, 1, 16, 48, c)  # W=48: exercises the W-pad path
        mod = RCAGroup(channels=c, nb=nb, reduction=4)
        p = mod.init(jax.random.key(5), x)
        ref = mod.apply(p, x)
        xb = jnp.transpose(x, (0, 1, 3, 2))
        out = fused_rcag_pair_bhcw(p["params"], xb, nb, 8, True)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(out, (0, 1, 3, 2))), np.asarray(ref),
            atol=1e-5)

    def test_rcagroup_pair_flag(self):
        mod = RCAGroup(channels=8, nb=2, reduction=4, fused="pair")
        x = _rand(48, 1, 16, 128, 8)
        p = mod.init(jax.random.key(6), x)
        ref = RCAGroup(channels=8, nb=2, reduction=4).apply(p, x)
        out = mod.apply(p, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
