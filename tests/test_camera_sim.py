"""Physically-grounded camera simulation tests (VERDICT r3 next #5):
shape/determinism contracts and the properties that make the RealCamNet
contributions (GFT/LFT/CADR) load-bearing on this data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.data.dataset import (
    camera_batch_jax,
    camera_eval_batches_jax,
    coord_map,
)


class TestCameraSim:
    def test_shapes_ranges_determinism(self):
        b = camera_batch_jax(jax.random.key(0), 3, 64)
        assert b["raw"].shape == (3, 64, 64, 4)
        assert b["cond"].shape == (3, 64, 64, 4)
        assert b["coord"].shape == (3, 64, 64, 2)
        assert b["target"].shape == (3, 128, 128, 3)
        for k, v in b.items():
            v = np.asarray(v)
            assert np.isfinite(v).all(), k
        raw = np.asarray(b["raw"])
        assert raw.min() >= 0 and raw.max() <= 1
        tgt = np.asarray(b["target"])
        assert tgt.min() >= 0 and tgt.max() <= 1
        assert -1 <= float(np.asarray(b["coord"]).min())
        assert float(np.asarray(b["coord"]).max()) <= 1
        b2 = camera_batch_jax(jax.random.key(0), 3, 64)
        np.testing.assert_array_equal(np.asarray(b["raw"]),
                                      np.asarray(b2["raw"]))

    def test_quantized_to_10bit(self):
        b = camera_batch_jax(jax.random.key(1), 1, 32)
        raw = np.asarray(b["raw"], np.float64) * 1023.0
        np.testing.assert_allclose(raw, np.round(raw), atol=1e-3)

    def test_per_image_color_variation(self):
        """Same scene statistics, different per-image camera: the raw/target
        color relationship must differ across images (what GFT must infer)."""
        b = camera_batch_jax(jax.random.key(2), 8, 64)
        raw = np.asarray(b["raw"], np.float64)
        tgt = np.asarray(b["target"], np.float64)
        # Per-image red/blue ratio between what the sensor saw and the sRGB
        # target: WB jitter must spread it substantially.
        r_ratio = (raw[..., 0].mean((1, 2)) + 1e-6) / (tgt[..., 0].mean((1, 2)) + 1e-6)
        b_ratio = (raw[..., 3].mean((1, 2)) + 1e-6) / (tgt[..., 2].mean((1, 2)) + 1e-6)
        assert r_ratio.std() / r_ratio.mean() > 0.05
        assert b_ratio.std() / b_ratio.mean() > 0.05

    def test_lens_shading_follows_coord(self):
        """Brightness falloff correlates with full-frame radius (coord), not
        patch position — what CADR must undo via the coord input."""
        b = camera_batch_jax(jax.random.key(3), 128, 32)
        raw = np.asarray(b["raw"], np.float64).mean(-1)   # (B, s, s)
        tgt = np.asarray(b["target"], np.float64).mean(-1)
        coord = np.asarray(b["coord"], np.float64)
        r2 = (coord[..., 0] ** 2 + coord[..., 1] ** 2)
        # Across the batch: raw-vs-target brightness ratio (normalizes out
        # scene content) drops with full-frame radius.
        ratio = raw.mean((1, 2)) / (tgt.mean((1, 2)) + 1e-6)
        corr_b = np.corrcoef(r2.mean((1, 2)), ratio)[0, 1]
        assert corr_b < -0.1, corr_b
        # Within each patch: brightness anticorrelates with radius.
        cs = [np.corrcoef(r2[i].ravel(), raw[i].ravel())[0, 1]
              for i in range(raw.shape[0])]
        assert np.mean(cs) < -0.15, np.mean(cs)

    def test_noise_present_but_bounded(self):
        """High-frequency energy in raw exceeds the (clean) target's."""
        b = camera_batch_jax(jax.random.key(4), 4, 64)
        raw = np.asarray(b["raw"], np.float64)
        diff = np.abs(np.diff(raw, axis=1)).mean()
        assert 1e-4 < diff < 0.5

    def test_eval_batches_deterministic(self):
        a = [np.asarray(b["raw"]) for b in camera_eval_batches_jax(7, 2, 32)]
        c = [np.asarray(b["raw"]) for b in camera_eval_batches_jax(7, 2, 32)]
        for x, y in zip(a, c):
            np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_camera_rd_training_learns():
    """A tiny flagship fits the camera data: loss decreases over a few
    steps (sanity that the task is learnable end to end)."""
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
    from realcamnet_tpu.train.isp import TrainState
    from realcamnet_tpu.train.rd import (make_rd_optimizer,
                                         make_rd_train_chunk)

    model = raw_compression_tcm_final(
        config=(1, 1, 1, 1, 1, 1, 1), head_dim=(4,) * 7, n=8, m=20,
        num_slices=5)
    example = camera_batch_jax(jax.random.key(0), 1, 32)
    params = jax.jit(model.init)(jax.random.key(1), example["raw"],
                                 example["cond"], example["coord"])
    state = TrainState.create(params, make_rd_optimizer(1e-3))
    chunk_fn = make_rd_train_chunk(model, 0.01, 2, 32, 10, data="camera")
    state, ms = chunk_fn(state, jax.random.key(2))
    first = float(np.asarray(ms["loss"])[0])
    state, ms = chunk_fn(state, jax.random.key(3))
    last = float(np.asarray(ms["loss"])[-1])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first
