"""Entropy subsystem tests: rANS round-trip, CDF quantization, likelihood
numerics, factorized-prior behavior (oracles: SURVEY.md §4 — analytic entropy
math `tcm.py:572-590` + round-trip properties)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.entropy import coder as rans
from realcamnet_tpu.entropy.cdf import PRECISION, TOTAL, pmf_to_quantized_cdf
from realcamnet_tpu.entropy.codec import (
    build_gaussian_tables,
    build_indexes_np,
)
from realcamnet_tpu.entropy.models import (
    EntropyBottleneck,
    GaussianConditional,
    get_scale_table,
    ste_round,
)


class TestCdf:
    def test_quantized_cdf_sums_to_total(self):
        pmf = np.array([0.1, 0.5, 0.3, 0.1])
        cdf = pmf_to_quantized_cdf(pmf, 1e-9)
        assert cdf[0] == 0 and cdf[-1] == TOTAL
        assert len(cdf) == len(pmf) + 2
        freqs = np.diff(cdf)
        assert (freqs >= 1).all()

    def test_tiny_probabilities_get_floor(self):
        pmf = np.array([1.0, 1e-12, 1e-12])
        cdf = pmf_to_quantized_cdf(pmf, 1e-12)
        assert (np.diff(cdf) >= 1).all()


class TestRans:
    def test_roundtrip_uniform(self):
        rng = np.random.RandomState(1)
        pmf = np.ones(16) / 16
        cdf = pmf_to_quantized_cdf(pmf, 1e-9)
        cdfs = cdf[None].astype(np.uint32)
        lengths = np.array([len(cdf)], np.int32)
        offsets = np.array([0], np.int32)
        sym = rng.randint(0, 16, 5000).astype(np.int32)
        idx = np.zeros(5000, np.int32)
        data = rans.encode_with_indexes(sym, idx, cdfs, lengths, offsets)
        out = rans.decode_with_indexes(data, idx, cdfs, lengths, offsets)
        assert np.array_equal(sym, out)
        # Near-uniform 16-symbol source: ~4 bits/symbol + small overhead.
        assert len(data) * 8 / 5000 < 4.3

    def test_roundtrip_escape_extremes(self):
        pmf = np.array([0.2, 0.6, 0.2])
        cdf = pmf_to_quantized_cdf(pmf, 1e-9)
        cdfs = cdf[None].astype(np.uint32)
        lengths = np.array([len(cdf)], np.int32)
        offsets = np.array([-1], np.int32)
        sym = np.array([-1, 0, 1, -100000, 100000, 2147000000, -2147000000], np.int32)
        idx = np.zeros(len(sym), np.int32)
        data = rans.encode_with_indexes(sym, idx, cdfs, lengths, offsets)
        out = rans.decode_with_indexes(data, idx, cdfs, lengths, offsets)
        assert np.array_equal(sym, out)

    def test_compression_ratio_matches_entropy(self):
        """Skewed source: coded size within 2% of the Shannon bound."""
        rng = np.random.RandomState(2)
        p = np.array([0.85, 0.1, 0.04, 0.01])
        cdf = pmf_to_quantized_cdf(p, 1e-9)
        cdfs = cdf[None].astype(np.uint32)
        lengths = np.array([len(cdf)], np.int32)
        offsets = np.array([0], np.int32)
        n = 200_000
        sym = rng.choice(4, size=n, p=p).astype(np.int32)
        idx = np.zeros(n, np.int32)
        data = rans.encode_with_indexes(sym, idx, cdfs, lengths, offsets)
        bits = len(data) * 8
        entropy = -(p * np.log2(p)).sum() * n
        assert bits < entropy * 1.02 + 64


class TestGaussianConditional:
    def test_likelihood_matches_closed_form(self):
        gc = GaussianConditional()
        v = jnp.array([[[[0.0, 1.0, -2.0]]]])
        s = jnp.full_like(v, 1.0)
        _, lik = gc.init_with_output(jax.random.key(0), v, s)[0], None
        vhat, lik = gc.apply({}, v, s)
        def phi(x):
            return 0.5 * math.erfc(-x / math.sqrt(2))
        for val, l in zip([0.0, 1.0, -2.0], np.asarray(lik).reshape(-1)):
            want = phi((0.5 - abs(val)) / 1.0) - phi((-0.5 - abs(val)) / 1.0)
            assert abs(l - want) < 1e-6

    def test_scale_floor(self):
        gc = GaussianConditional()
        v = jnp.zeros((1, 1, 1, 1))
        tiny = jnp.full_like(v, 1e-4)
        floor = jnp.full_like(v, 0.11)
        _, l1 = gc.apply({}, v, tiny)
        _, l2 = gc.apply({}, v, floor)
        np.testing.assert_allclose(l1, l2, rtol=1e-6)

    def test_build_indexes(self):
        table = get_scale_table()
        scales = np.array([0.05, 0.11, 1.0, 255.0, 300.0])
        idx = build_indexes_np(scales, table)
        # Ceiling property (up to 1-ulp table noise): table[idx] covers scale.
        clamped = np.maximum(scales, 0.11)
        assert (table[idx] * (1 + 1e-6) >= np.minimum(clamped, table[-1])).all()
        assert idx[0] <= 1 and idx[1] <= 1
        assert idx[-1] == len(table) - 1

    def test_gaussian_tables_roundtrip(self):
        tables = build_gaussian_tables()
        rng = np.random.RandomState(3)
        scales = np.exp(rng.uniform(np.log(0.11), np.log(30.0), 4000)).astype(np.float32)
        idx = build_indexes_np(scales, get_scale_table())
        sym = np.round(rng.randn(4000) * scales).astype(np.int32)
        data = rans.encode_with_indexes(sym, idx, tables.cdfs,
                                        tables.cdf_lengths, tables.offsets)
        out = rans.decode_with_indexes(data, idx, tables.cdfs,
                                       tables.cdf_lengths, tables.offsets)
        assert np.array_equal(sym, out)
        # Coded size should be near the model cross-entropy.
        def phi(x):
            return 0.5 * _erfc_np(-x / math.sqrt(2))
        up = phi((0.5 - np.abs(sym)) / np.maximum(scales, 0.11))
        lo = phi((-0.5 - np.abs(sym)) / np.maximum(scales, 0.11))
        nats = -np.log(np.maximum(up - lo, 1e-12)).sum()
        assert len(data) * 8 < nats / math.log(2) * 1.08 + 128


def _erfc_np(x):
    import numpy as _np

    return _np.vectorize(math.erfc)(x)


class TestEntropyBottleneck:
    def test_likelihood_positive_and_normalized(self):
        eb = EntropyBottleneck(4)
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4)) * 3
        params = eb.init(jax.random.key(1), x)
        x_hat, lik = eb.apply(params, x)
        assert (np.asarray(lik) > 0).all() and (np.asarray(lik) <= 1).all()
        # Eval mode: x_hat is integer-shifted by medians.
        med = eb.apply(params, method="medians")
        diff = np.asarray(x_hat) - np.asarray(med)[None, None, None, :]
        np.testing.assert_allclose(diff, np.round(diff), atol=1e-5)

    def test_training_noise_mode(self):
        eb = EntropyBottleneck(2)
        x = jnp.zeros((1, 4, 4, 2))
        params = eb.init(jax.random.key(0), x)
        x_hat, _ = eb.apply(params, x, train=True,
                            rngs={"noise": jax.random.key(5)})
        d = np.asarray(x_hat)
        assert (np.abs(d) <= 0.5).all() and np.abs(d).max() > 0.01

    def test_aux_loss_decreases_quantile_error(self):
        eb = EntropyBottleneck(3)
        x = jnp.zeros((1, 2, 2, 3))
        params = eb.init(jax.random.key(0), x)
        loss = eb.apply(params, method="aux_loss")
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_pmf_tables_roundtrip(self):
        from realcamnet_tpu.entropy.codec import build_factorized_tables

        eb = EntropyBottleneck(4)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4)) * 2
        params = eb.init(jax.random.key(1), x)
        pmf, tail, offsets, lengths = jax.device_get(
            eb.apply(params, method="pmf_params", max_length=256))
        tables = build_factorized_tables(pmf, tail, offsets, lengths)
        med = np.asarray(jax.device_get(eb.apply(params, method="medians")))
        sym = np.round(np.asarray(x[0]) - med).astype(np.int32)
        idx = np.broadcast_to(np.arange(4, dtype=np.int32), sym.shape)
        data = rans.encode_with_indexes(sym.reshape(-1), idx.reshape(-1),
                                        tables.cdfs, tables.cdf_lengths,
                                        tables.offsets)
        out = rans.decode_with_indexes(data, idx.reshape(-1), tables.cdfs,
                                       tables.cdf_lengths, tables.offsets)
        assert np.array_equal(sym.reshape(-1), out)


class TestEntropyBottleneckTorchOracle:
    """Parity vs the full CompressAI factorized density (VERDICT r3 weak #8):
    the torch stub implements compressai's matrix/bias/factor chain +
    quantile machinery; likelihoods, pmf tables, and bpp_z must agree."""

    C = 6

    def _pair(self, seed=0):
        import torch

        from tests.compressai_stub import EntropyBottleneck as TorchEB

        eb = EntropyBottleneck(self.C)
        params = eb.init(jax.random.key(seed), jnp.zeros((1, 4, 4, self.C)))
        # Perturb all density params so the channels have distinct,
        # nontrivial densities (init is symmetric/identical per channel).
        leaves, tree = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.key(seed + 1), len(leaves))
        leaves = [l + 0.3 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)]
        params = jax.tree_util.tree_unflatten(tree, leaves)
        teb = TorchEB(self.C)
        p = params["params"]
        with torch.no_grad():
            for i in range(5):
                getattr(teb, f"_matrix{i}").copy_(
                    torch.from_numpy(np.asarray(p[f"matrix{i}"])))
                getattr(teb, f"_bias{i}").copy_(
                    torch.from_numpy(np.asarray(p[f"bias{i}"])))
                if i < 4:
                    getattr(teb, f"_factor{i}").copy_(
                        torch.from_numpy(np.asarray(p[f"factor{i}"])))
            teb.quantiles.copy_(
                torch.from_numpy(np.asarray(p["quantiles"])))
        teb.eval()
        return eb, params, teb

    def test_likelihood_and_bpp_parity(self):
        import torch

        eb, params, teb = self._pair()
        x = jax.random.normal(jax.random.key(3), (2, 8, 8, self.C)) * 4
        x_hat, lik = eb.apply(params, x)
        xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
        with torch.no_grad():
            xt_hat, lik_t = teb(xt, training=False)
        lik_t = lik_t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(x_hat),
                                   xt_hat.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(lik), lik_t, atol=1e-6,
                                   rtol=1e-5)
        bpp = float(-jnp.log2(lik).sum() / (2 * 8 * 8))
        bpp_t = float(-np.log2(lik_t).sum() / (2 * 8 * 8))
        assert abs(bpp - bpp_t) / max(bpp_t, 1e-9) < 1e-5

    def test_pmf_table_parity(self):
        eb, params, teb = self._pair(seed=7)
        pmf, tail, offsets, lengths = jax.device_get(
            eb.apply(params, method="pmf_params", max_length=256))
        pmf_t, tail_t, off_t, len_t = (t.numpy() for t in
                                       teb.pmf_params(max_length=256))
        np.testing.assert_array_equal(lengths, len_t)
        np.testing.assert_array_equal(offsets, off_t)
        for c in range(self.C):
            np.testing.assert_allclose(pmf[c, :lengths[c]],
                                       pmf_t[c, :lengths[c]], atol=1e-6,
                                       rtol=1e-5, err_msg=f"pmf ch{c}")
        np.testing.assert_allclose(tail, tail_t, atol=1e-6, rtol=1e-4)

    def test_quantized_cdf_parity(self):
        from realcamnet_tpu.entropy.codec import build_factorized_tables

        eb, params, teb = self._pair(seed=11)
        ours = build_factorized_tables(*jax.device_get(
            eb.apply(params, method="pmf_params", max_length=256)))
        pmf_t, tail_t, off_t, len_t = (t.numpy() for t in
                                       teb.pmf_params(max_length=256))
        theirs = build_factorized_tables(pmf_t, tail_t, off_t, len_t)
        np.testing.assert_array_equal(ours.cdf_lengths, theirs.cdf_lengths)
        np.testing.assert_array_equal(ours.offsets, theirs.offsets)
        for c in range(self.C):
            n = ours.cdf_lengths[c]
            np.testing.assert_array_equal(ours.cdfs[c, :n],
                                          theirs.cdfs[c, :n],
                                          err_msg=f"cdf ch{c}")


def test_ste_round_gradient():
    g = jax.grad(lambda x: jnp.sum(ste_round(x) * 2.0))(jnp.array([0.3, 1.7]))
    np.testing.assert_allclose(g, [2.0, 2.0])
