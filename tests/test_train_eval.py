"""Training loop, metrics, data pipeline, checkpoint tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from realcamnet_tpu.data.dataset import (
    coord_map,
    pack_bayer_np,
    synthetic_batch,
)
from realcamnet_tpu.evaluation.metrics import (
    delta_e_cie76,
    delta_e_ciede2000,
    ms_ssim,
    ms_ssim_db,
    psnr,
    ssim,
)
from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
from realcamnet_tpu.train.isp import TrainState
from realcamnet_tpu.train.rd import make_rd_optimizer, make_rd_train_step
pytestmark = pytest.mark.slow  # compile-heavy; run with -m slow or no -m filter



TINY = dict(config=(1, 1, 1, 1, 1, 1, 1), head_dim=(4, 4, 4, 4, 4, 4, 4),
            n=8, m=20, num_slices=5)


class TestMetrics:
    def test_psnr_identity(self):
        x = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3))
        assert float(psnr(x, x)) > 100

    def test_ssim_identity_and_noise(self):
        x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
        assert abs(float(ssim(x, x)) - 1.0) < 1e-5
        y = jnp.clip(x + 0.3 * jax.random.normal(jax.random.key(1), x.shape), 0, 1)
        assert float(ssim(x, y)) < 0.9

    def test_ms_ssim_range(self):
        x = jax.random.uniform(jax.random.key(0), (1, 192, 192, 3))
        y = jnp.clip(x + 0.05 * jax.random.normal(jax.random.key(1), x.shape), 0, 1)
        v = float(ms_ssim(x, y))
        assert 0.5 < v < 1.0
        assert float(ms_ssim_db(x, x)) >= 99.0

    def test_delta_e_zero_and_positive(self):
        x = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3))
        assert float(delta_e_cie76(x, x)) < 1e-3
        assert float(delta_e_ciede2000(x, x)) < 1e-3
        y = jnp.clip(x + 0.1, 0, 1)
        assert float(delta_e_ciede2000(x, y)) > 0.5


class TestData:
    def test_coord_map_range(self):
        c = coord_map(16, 32, (0, 0), (16, 32))
        assert c.shape == (16, 32, 2)
        np.testing.assert_allclose(c[0, 0], [-1, -1])
        np.testing.assert_allclose(c[-1, -1], [1, 1])
        # Crop inside a larger frame: values strictly inside [-1, 1].
        c2 = coord_map(8, 8, (4, 4), (16, 16))
        assert c2.min() > -1 and c2.max() < 1

    def test_pack_bayer_np(self):
        raw = np.arange(16, dtype=np.float32).reshape(4, 4)
        p = pack_bayer_np(raw)
        assert p.shape == (2, 2, 4)
        np.testing.assert_allclose(p[0, 0], [0, 1, 4, 5])

    def test_synthetic_batch_deterministic(self):
        a = synthetic_batch(7, 2, 32)
        b = synthetic_batch(7, 2, 32)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
        assert a["raw"].shape == (2, 32, 32, 4)
        assert a["target"].shape == (2, 64, 64, 3)


class TestRDTraining:
    def test_rd_step_improves_loss(self):
        model = raw_compression_tcm_final(**TINY)
        batch_np = synthetic_batch(0, 2, 32)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        params = model.init(jax.random.key(0), batch["raw"][:1],
                            batch["cond"][:1], batch["coord"][:1])
        tx = make_rd_optimizer(1e-3)
        state = TrainState.create(params, tx)
        step = make_rd_train_step(model, lmbda=0.01)
        losses = []
        rng = jax.random.key(1)
        for i in range(8):
            rng, sub = jax.random.split(rng)
            state, m = step(state, batch, sub)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        # Overfitting a fixed batch must reduce the loss.
        assert losses[-1] < losses[0]
        assert float(m["aux_loss"]) >= 0

    def test_quantiles_only_moved_by_aux(self):
        """The optimizer split: quantile params get the aux gradient."""
        model = raw_compression_tcm_final(**TINY)
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(0, 1, 32).items()}
        params = model.init(jax.random.key(0), batch["raw"], batch["cond"],
                            batch["coord"])
        q0 = np.asarray(params["params"]["entropy_bottleneck"]["quantiles"])
        state = TrainState.create(params, make_rd_optimizer(1e-3))
        step = make_rd_train_step(model, lmbda=0.01)
        state, _ = step(state, batch, jax.random.key(1))
        q1 = np.asarray(state.params["params"]["entropy_bottleneck"]["quantiles"])
        assert not np.allclose(q0, q1)  # aux loss moves quantiles


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from realcamnet_tpu.train.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
            save_checkpoint,
        )

        model = raw_compression_tcm_final(**TINY)
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(0, 1, 32).items()}
        params = model.init(jax.random.key(0), batch["raw"], batch["cond"],
                            batch["coord"])
        state = TrainState.create(params, make_rd_optimizer())
        step = make_rd_train_step(model, lmbda=0.01)
        state, _ = step(state, batch, jax.random.key(1))
        path = save_checkpoint(str(tmp_path), state)
        assert latest_checkpoint(str(tmp_path)) == path

        fresh = TrainState.create(params, make_rd_optimizer())
        restored = restore_checkpoint(path, fresh)
        assert int(restored.step) == 1
        a = jax.tree.leaves(state.params)
        b = jax.tree.leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cli_models(capsys):
    from realcamnet_tpu.cli.main import main

    main(["models"])
    out = capsys.readouterr().out
    assert "raw_compression_tcm_final" in out
    assert "LiteISPNet_GFM_LSC" in out
