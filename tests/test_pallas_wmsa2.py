"""Fused heads-in-sublanes window-attention kernel (ops/attention/
pallas_wmsa2.py) vs the XLA WMSA path — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.ops.attention.pallas_wmsa2 import wmsa_fused
from realcamnet_tpu.ops.attention.wmsa import (
    WMSA,
    SwinTransformerBlock,
    _shift_patterns,
    wmsa_pallas,
)

pytestmark = pytest.mark.slow  # compile-heavy; run with -m slow or no -m filter


def _ref_attn(xw, wqkv, bqkv, wproj, bproj, bias, scale, heads,
              mask=None):
    g, p2, c = xw.shape
    hd = c // heads
    qkv = xw @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sh = lambda t: t.reshape(g, p2, heads, hd).transpose(0, 2, 1, 3)
    sim = jnp.einsum("ghpc,ghqc->ghpq", sh(q), sh(k)) * scale + bias[None]
    if mask is not None:
        sim = sim + mask
    pr = jax.nn.softmax(sim, -1)
    o = jnp.einsum("ghpq,ghqc->ghpc", pr, sh(v))
    o = o.transpose(0, 2, 1, 3).reshape(g, p2, c)
    return o @ wproj + bproj


@pytest.mark.parametrize("heads", [8, 4, 2])
def test_kernel_matches_reference(heads):
    rng = np.random.RandomState(heads)
    g, p2, c = 12, 64, 64
    hd = c // heads
    xw = jnp.asarray(rng.rand(g, p2, c) - 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.rand(c, 3 * c) - 0.5, jnp.float32) * 0.2
    bqkv = jnp.asarray(rng.rand(3 * c) - 0.5, jnp.float32) * 0.1
    wproj = jnp.asarray(rng.rand(c, c) - 0.5, jnp.float32) * 0.2
    bproj = jnp.asarray(rng.rand(c) - 0.5, jnp.float32) * 0.1
    bias = jnp.asarray(rng.rand(heads, p2, p2) - 0.5, jnp.float32)
    scale = hd ** -0.5
    ref = _ref_attn(xw, wqkv, bqkv, wproj, bproj, bias, scale, heads)
    bias_kq = jnp.transpose(bias, (0, 2, 1)).reshape(heads * p2, p2)
    out = wmsa_fused(xw, wqkv, bqkv, wproj, bproj, bias_kq, scale, heads,
                     wb=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_seam_mask():
    rng = np.random.RandomState(0)
    g, p2, c, heads = 10, 64, 64, 8
    xw = jnp.asarray(rng.rand(g, p2, c) - 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.rand(c, 3 * c) - 0.5, jnp.float32) * 0.2
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.rand(c, c) - 0.5, jnp.float32) * 0.2
    bproj = jnp.zeros((c,), jnp.float32)
    bias = jnp.asarray(rng.rand(heads, p2, p2) - 0.5, jnp.float32)
    row_pat, col_pat = _shift_patterns(8, 4)
    rowm = jnp.asarray(row_pat, jnp.float32) * -1e9
    colm = jnp.asarray(col_pat, jnp.float32) * -1e9
    flags = jnp.asarray(rng.randint(0, 2, (g, 2)), jnp.float32)
    mask = (flags[:, 0, None, None, None] * rowm
            + flags[:, 1, None, None, None] * colm)
    ref = _ref_attn(xw, wqkv, bqkv, wproj, bproj, bias, 8 ** -0.5, heads,
                    mask=mask)
    bias_kq = jnp.transpose(bias, (0, 2, 1)).reshape(heads * p2, p2)
    out = wmsa_fused(xw, wqkv, bqkv, wproj, bproj, bias_kq, 8 ** -0.5,
                     heads,
                     seam=(jnp.tile(rowm, (heads, 1)),
                           jnp.tile(colm, (heads, 1)), flags),
                     wb=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("shifted", [False, True])
@pytest.mark.parametrize("hd", [8, 16, 32])
def test_wmsa_module_v2(shifted, hd):
    m_ref = WMSA(64, hd, 8, shifted, use_pallas=False)
    m_v2 = WMSA(64, hd, 8, shifted, use_pallas="v2")
    x = jax.random.uniform(jax.random.key(0), (2, 24, 16, 64)) - 0.5
    p = m_ref.init(jax.random.key(1), x)
    a = m_ref.apply(p, x)
    b = m_v2.apply(p, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_swin_block_under_switch():
    sb = SwinTransformerBlock(64, 8, 8, True)
    x = jax.random.uniform(jax.random.key(0), (1, 16, 24, 64)) - 0.5
    p = sb.init(jax.random.key(1), x)
    ref = sb.apply(p, x)
    with wmsa_pallas("v2"):
        out = sb.apply(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_nonmultiple_window_pad():
    """H/W not window multiples: pad/crop path under the kernel."""
    m_ref = WMSA(64, 8, 8, True, use_pallas=False)
    m_v2 = WMSA(64, 8, 8, True, use_pallas="v2")
    x = jax.random.uniform(jax.random.key(0), (1, 20, 28, 64)) - 0.5
    p = m_ref.init(jax.random.key(1), x)
    np.testing.assert_allclose(np.asarray(m_v2.apply(p, x)),
                               np.asarray(m_ref.apply(p, x)), atol=1e-5)
