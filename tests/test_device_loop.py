"""On-device data generator + scan-chunk trainer + classifier train step.

Covers the r3 additions: `synthetic_batch_jax` (device twin of the numpy
generator), `make_rd_train_chunk` (lax.scan training used by
`rcn train --device-loop` and the RD sweep), and the GroupMixFormer
classification step (`rcn train --model groupmixformer`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from realcamnet_tpu.data.dataset import (
    synthetic_batch_jax,
    synthetic_eval_batches_jax,
)

TINY = dict(config=(1, 1, 1, 1, 1, 1, 1), head_dim=(4, 4, 4, 4, 4, 4, 4),
            n=8, m=20, num_slices=5)


class TestSyntheticJax:
    def test_shapes_and_ranges(self):
        b = synthetic_batch_jax(jax.random.key(0), 2, 64)
        assert b["raw"].shape == (2, 64, 64, 4)
        assert b["cond"].shape == (2, 64, 64, 4)
        assert b["coord"].shape == (2, 64, 64, 2)
        assert b["target"].shape == (2, 128, 128, 3)
        assert float(b["target"].min()) >= 0.0
        assert float(b["target"].max()) <= 1.0
        assert float(jnp.abs(b["coord"]).max()) <= 1.0

    def test_vignetting_consistent_with_coord(self):
        # raw = packed * vign with vign < 1 off-center: corner raw energy
        # must be attenuated relative to what the target implies at center.
        b = synthetic_batch_jax(jax.random.key(1), 1, 64)
        raw = np.asarray(b["raw"][0])
        coord = np.asarray(b["coord"][0])
        vign = 1.0 - 0.3 * (coord[..., 0] ** 2 + coord[..., 1] ** 2) / 2.0
        unvign = raw / vign[..., None]
        # Undone raw is a valid linear image in (0, 1).
        assert unvign.max() <= 1.0 + 1e-5
        assert vign.min() < 0.75  # corners really are attenuated

    def test_deterministic_eval_batches(self):
        a = list(synthetic_eval_batches_jax(7, 2, 32))
        b = list(synthetic_eval_batches_jax(7, 2, 32))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x["raw"]),
                                          np.asarray(y["raw"]))

    def test_compressible_content(self):
        # Multi-scale field must be spatially correlated (the point of the
        # redesign): neighbor correlation far above iid noise.
        b = synthetic_batch_jax(jax.random.key(2), 1, 128)
        t = np.asarray(b["target"][0, :, :, 0])
        x, y = t[:, :-1].ravel(), t[:, 1:].ravel()
        r = np.corrcoef(x, y)[0, 1]
        assert r > 0.8


@pytest.mark.slow
class TestRdTrainChunk:
    def test_chunk_runs_and_counts_steps(self):
        from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final
        from realcamnet_tpu.train.isp import TrainState
        from realcamnet_tpu.train.rd import (
            make_rd_optimizer,
            make_rd_train_chunk,
        )

        model = raw_compression_tcm_final(**TINY)
        b = synthetic_batch_jax(jax.random.key(0), 1, 64)
        params = jax.jit(model.init)(jax.random.key(0), b["raw"], b["cond"],
                                     b["coord"])
        state = TrainState.create(params, make_rd_optimizer(1e-4))
        chunk_fn = make_rd_train_chunk(model, 0.01, batch_size=1, patch=64,
                                       chunk=2)
        state, ms = chunk_fn(state, jax.random.key(1))
        assert int(state.step) == 2
        losses = np.asarray(ms["loss"])
        assert losses.shape == (2,)
        assert np.all(np.isfinite(losses))
        # Chunks chain: state is reusable (donated buffers re-created).
        state, ms2 = chunk_fn(state, jax.random.key(2))
        assert int(state.step) == 4


@pytest.mark.slow
class TestClassifyStep:
    def test_groupmix_cls_step(self):
        from realcamnet_tpu.models.groupmix import GroupMixFormer
        from realcamnet_tpu.train.classify import (
            ClsTrainState,
            make_cls_train_step,
            synthetic_cls_batch,
        )

        # dims divisible by 5 (GroupMix 5-segment split) with 8 heads.
        model = GroupMixFormer(embedding_dims=(40, 40, 40, 40),
                               serial_depths=(1, 1, 1, 1), num_heads=8,
                               num_classes=4, drop_path_rate=0.0)
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_cls_batch(0, 2, 64, 4).items()}
        variables = model.init(jax.random.key(0), batch["image"], train=False)
        assert "batch_stats" in variables
        tx = optax.adamw(1e-3)
        state = ClsTrainState.create(variables, tx)
        step = make_cls_train_step(model)
        state, m = step(state, batch, jax.random.key(1))
        assert int(state.step) == 1
        assert np.isfinite(float(m["loss"]))
        # batch_stats actually updated
        flat = jax.tree.leaves(state.batch_stats)
        assert any(float(jnp.abs(x).sum()) > 0 for x in flat)
