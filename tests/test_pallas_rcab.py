"""Fused RCAB-chain Pallas kernel vs the unfused flax path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.ops.blocks import RCAGroup
from realcamnet_tpu.ops.pallas_rcab import (

    _ref_impl,
    fused_rcab_convs,
    fused_rcag_apply,
)
pytestmark = pytest.mark.slow  # compile-heavy; run with -m slow or no -m filter



def _rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("h,w,th", [(16, 16, 4), (24, 7, 8)])
def test_fused_rcab_convs_matches_ref(fold, h, w, th):
    c = 8
    x = _rand(0, 2, h, w, c)
    res_prev = _rand(1, 2, h, w, c) if fold else None
    gate = jax.nn.sigmoid(_rand(2, 2, c)) if fold else None
    w1, b1 = _rand(3, 3, 3, c, c) * 0.2, _rand(4, c) * 0.1
    w2, b2 = _rand(5, 3, 3, c, c) * 0.2, _rand(6, c) * 0.1

    ref = _ref_impl(x, res_prev, gate, w1, b1, w2, b2)
    out = fused_rcab_convs(x, res_prev, gate, w1, b1, w2, b2, th, 8, True)
    for a, b, name in zip(out, ref, ("xin", "res", "sums")):
        # sums accumulate over H*W in f32 -> looser absolute tolerance
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3 if name == "sums" else 1e-4,
                                   err_msg=name)


def test_fused_rcag_matches_flax_group():
    c, nb = 8, 3
    x = _rand(7, 1, 16, 16, c)
    mod = RCAGroup(channels=c, nb=nb, reduction=4)
    params = mod.init(jax.random.key(0), x)
    want = mod.apply(params, x)
    got = fused_rcag_apply(params["params"], x, nb, tile_h=4, tile_w=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_rcab_grads_match_ref():
    c = 4
    x = _rand(8, 1, 16, 16, c)
    w1, b1 = _rand(9, 3, 3, c, c) * 0.2, _rand(10, c) * 0.1
    w2, b2 = _rand(11, 3, 3, c, c) * 0.2, _rand(12, c) * 0.1

    def loss_fused(x_, w1_):
        _, r, s = fused_rcab_convs(x_, None, None, w1_, b1, w2, b2, 4, 8, True)
        return jnp.sum(r ** 2) + jnp.sum(s)

    def loss_ref(x_, w1_):
        _, r, s = _ref_impl(x_, None, None, w1_, b1, w2, b2)
        return jnp.sum(r ** 2) + jnp.sum(s)

    ga = jax.grad(loss_fused, argnums=(0, 1))(x, w1)
    gb = jax.grad(loss_ref, argnums=(0, 1))(x, w1)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_fused_flagship_matches_unfused():
    """LiteISPNet_GFM_LSC with fused_rcab=True == the unfused model on the
    same params (small maps fall back to XLA; big stages run the kernel)."""
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc

    m0 = lite_isp_net_gfm_lsc()
    m1 = lite_isp_net_gfm_lsc(fused_rcab=True)
    raw = _rand(0, 1, 64, 64, 4)
    cond = _rand(1, 1, 64, 64, 4)
    coord = _rand(2, 1, 64, 64, 2)
    p = jax.jit(m0.init)(jax.random.key(3), raw, cond, coord)
    a = m0.apply(p, raw, cond, coord)
    b = m1.apply(p, raw, cond, coord)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)
