"""TCM compression model tests: shapes, likelihood sanity, WMSA equivalence
to naive attention, and real-bitstream round-trip vs the eval forward path
(SURVEY.md §4 oracle (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.models.tcm import TCM

pytestmark = pytest.mark.slow  # compile-heavy; run with -m slow or no -m filter


TINY = dict(config=(1, 1, 1, 1, 1, 1), head_dim=(4, 4, 4, 4, 4, 4), n=8, m=20,
            num_slices=5)


def tiny_tcm():
    return TCM(**TINY)


class TestWMSA:
    def test_matches_naive_attention_single_window(self):
        """One 4x4 window, no shift: WMSA == plain softmax attention with the
        gathered relative-position bias."""
        from realcamnet_tpu.ops.attention.wmsa import WMSA, _relative_index

        dim, hd, w = 8, 4, 4
        m = WMSA(dim, hd, w, shifted=False)
        x = jax.random.normal(jax.random.key(0), (1, 4, 4, dim))
        params = m.init(jax.random.key(1), x)
        out = m.apply(params, x)

        p = params["params"]
        kern = np.asarray(p["qkv"]["kernel"])  # (dim, 3dim)
        bias = np.asarray(p["qkv"]["bias"])
        table = np.asarray(p["rel_pos_bias"])  # (2w-1, 2w-1, heads)
        xt = np.asarray(x).reshape(16, dim)
        qkv = xt @ kern + bias
        nh = dim // hd
        q, k, v = np.split(qkv, 3, -1)
        q = q.reshape(16, nh, hd).transpose(1, 0, 2)
        k = k.reshape(16, nh, hd).transpose(1, 0, 2)
        v = v.reshape(16, nh, hd).transpose(1, 0, 2)
        sim = np.einsum("hpc,hqc->hpq", q, k) * hd ** -0.5
        idx = _relative_index(w)
        sim = sim + table[idx[..., 0], idx[..., 1]].transpose(2, 0, 1)
        probs = np.exp(sim - sim.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        ref = np.einsum("hpq,hqc->hpc", probs, v).transpose(1, 0, 2).reshape(16, dim)
        ref = ref @ np.asarray(p["proj"]["kernel"]) + np.asarray(p["proj"]["bias"])
        np.testing.assert_allclose(np.asarray(out).reshape(16, dim), ref,
                                   atol=1e-5)

    def test_shifted_differs_and_shapes(self):
        from realcamnet_tpu.ops.attention.wmsa import WMSA

        m_w = WMSA(8, 4, 4, shifted=False)
        m_sw = WMSA(8, 4, 4, shifted=True)
        x = jax.random.normal(jax.random.key(0), (2, 8, 12, 8))
        p = m_w.init(jax.random.key(1), x)
        out_w = m_w.apply(p, x)
        out_sw = m_sw.apply(p, x)
        assert out_w.shape == x.shape == out_sw.shape
        assert not np.allclose(out_w, out_sw)

    def test_non_multiple_input_padded(self):
        from realcamnet_tpu.ops.attention.wmsa import WMSA

        m = WMSA(8, 4, 8, shifted=True)
        x = jax.random.normal(jax.random.key(0), (1, 10, 14, 8))
        out, _ = m.init_with_output(jax.random.key(1), x)
        assert out.shape == x.shape


class TestTCM:
    def test_forward_shapes(self):
        model = tiny_tcm()
        x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
        out, params = model.init_with_output(jax.random.key(1), x)
        assert out["x_hat"].shape == (1, 64, 64, 3)
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 20)
        assert out["likelihoods"]["z"].shape == (1, 1, 1, 192)
        assert out["para"]["means"].shape == (1, 4, 4, 20)
        lik = np.asarray(out["likelihoods"]["y"])
        assert (lik > 0).all() and (lik <= 1).all()

    def test_train_mode_grad(self):
        model = tiny_tcm()
        x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
        params = model.init(jax.random.key(1), x)

        def loss(p):
            out = model.apply(p, x, train=True,
                              rngs={"noise": jax.random.key(2),
                                    "dropout": jax.random.key(3)})
            bpp = -jnp.sum(jnp.log2(out["likelihoods"]["y"])) / (64 * 64)
            mse = jnp.mean((out["x_hat"] - x) ** 2)
            return bpp + 255**2 * 0.01 * mse

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_aux_loss_finite(self):
        model = tiny_tcm()
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.key(1), x)
        aux = model.apply(params, method="aux_loss")
        assert np.isfinite(float(aux))


@pytest.mark.slow
def test_codec_roundtrip():
    """decompress(compress(x)) must reproduce the eval forward's y_hat path:
    the decoded x_hat equals g_s(hard-rounded y_hat) bit-for-bit in fp32."""
    from realcamnet_tpu.entropy.codec import ChARMCodec

    model = tiny_tcm()
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = model.init(jax.random.key(1), x)

    codec = ChARMCodec(model, params)
    codec.update()
    out = codec.compress(x)
    assert len(out["strings"][0][0]) > 0 and len(out["strings"][1][0]) > 0
    dec = codec.decompress(out["strings"], out["shape"], z_channels=192)
    x_hat = np.asarray(dec["x_hat"])
    assert x_hat.shape == (1, 64, 64, 3)
    assert np.isfinite(x_hat).all()

    # Cross-check against the forward eval path's reconstruction.
    fwd = model.apply(params, x)
    ref = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
    np.testing.assert_allclose(x_hat, ref, atol=1e-3)
