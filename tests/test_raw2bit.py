"""raw2bit joint-model tests: the full ablation matrix traces with correct
shapes; the flagship trains (grad) and round-trips through the real codec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.models.raw2bit import RAW2BIT_MODELS, raw_compression_tcm_final
pytestmark = pytest.mark.slow  # compile-heavy; run with -m slow or no -m filter



# Tiny config: N=8 -> 2N=16 feature width, M=20 (5 slices of 4).
TINY = dict(config=(1, 1, 1, 1, 1, 1, 1), head_dim=(4, 4, 4, 4, 4, 4, 4),
            n=8, m=20, num_slices=5)


def _inputs(h=64, w=64):
    k = jax.random.key(0)
    raw = jax.random.uniform(k, (1, h, w, 4))
    cond = jax.random.uniform(k, (1, h, w, 4))
    coord = jax.random.uniform(k, (1, h, w, 2))
    return raw, cond, coord


@pytest.mark.parametrize("name", sorted(RAW2BIT_MODELS))
def test_forward_shapes_traced(name):
    model = RAW2BIT_MODELS[name](**TINY)
    raw, cond, coord = _inputs()
    out, _ = jax.eval_shape(
        lambda: model.init_with_output(jax.random.key(1), raw, cond, coord))
    # Packed raw (64,64,4) -> decoded sRGB at 2x (128,128,3).
    assert out["x_hat"].shape == (1, 128, 128, 3), name
    assert out["likelihoods"]["y"].shape == (1, 4, 4, 20), name
    assert out["likelihoods"]["z"].shape == (1, 1, 1, 192), name


def test_final_forward_numeric_and_extras():
    model = raw_compression_tcm_final(**TINY)
    raw, cond, coord = _inputs()
    out, params = model.init_with_output(jax.random.key(1), raw, cond, coord)
    assert np.isfinite(np.asarray(out["x_hat"])).all()
    # Flagship returns the LFT map and LSC gain for aux losses
    # (`raw2bit.py:1848-1855`).
    assert "lft" in out and out["lft"].shape[1:3] == (8, 8)
    assert "lsc" in out and out["lsc"].shape == (1, 64, 64, 16)
    lik = np.asarray(out["likelihoods"]["y"])
    assert (lik > 0).all() and (lik <= 1).all()


def test_final_rd_grad():
    model = raw_compression_tcm_final(**TINY)
    raw, cond, coord = _inputs(32, 32)
    params = model.init(jax.random.key(1), raw, cond, coord)
    target = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))

    def loss(p):
        out = model.apply(p, raw, cond, coord, train=True,
                          rngs={"noise": jax.random.key(3),
                                "dropout": jax.random.key(4)})
        num_px = 64 * 64
        bpp = (-jnp.sum(jnp.log2(out["likelihoods"]["y"]))
               - jnp.sum(jnp.log2(out["likelihoods"]["z"]))) / num_px
        mse = jnp.mean((out["x_hat"] - target) ** 2)
        return bpp + 0.01 * 255**2 * mse

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


@pytest.mark.slow
def test_final_codec_roundtrip():
    from realcamnet_tpu.entropy.codec import ChARMCodec

    model = raw_compression_tcm_final(**TINY)
    raw, cond, coord = _inputs()
    params = model.init(jax.random.key(1), raw, cond, coord)
    codec = ChARMCodec(model, params)
    codec.update()
    out = codec.compress(raw, cond, coord)
    dec = codec.decompress(out["strings"], out["shape"])
    x_hat = np.asarray(dec["x_hat"])
    fwd = model.apply(params, raw, cond, coord)
    ref = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
    np.testing.assert_allclose(x_hat, ref, atol=1e-3)
