"""GMA / GroupMixFormer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from realcamnet_tpu.models.groupmix import GroupMixFormer
from realcamnet_tpu.ops.attention.gma import ConvPosEnc, EfficientAtt, GMABlock


def test_efficient_att_shapes():
    m = EfficientAtt(dim=40, num_heads=8)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 40))
    vars_ = m.init(jax.random.key(1), x)
    out = m.apply(vars_, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_efficient_att_linear_in_tokens():
    """Linear attention must not mix information across batch elements and
    stays finite on larger grids."""
    m = EfficientAtt(dim=40, num_heads=8)
    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 40))
    vars_ = m.init(jax.random.key(1), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 16, 16, 40)


def test_gma_block_train_batchstats():
    m = GMABlock(dim=40, num_heads=8, drop_path_rate=0.1)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 40))
    vars_ = m.init(jax.random.key(1), x)
    assert "batch_stats" in vars_
    out, updates = m.apply(vars_, x, train=True,
                           rngs={"dropout": jax.random.key(2)},
                           mutable=["batch_stats"])
    assert out.shape == x.shape


def test_groupmixformer_tiny_classifier():
    m = GroupMixFormer(embedding_dims=(20, 20, 20, 20),
                       serial_depths=(1, 1, 1, 1), num_heads=4,
                       num_classes=10)
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3))
    out, _ = jax.eval_shape(lambda: m.init_with_output(jax.random.key(1), x))
    assert out.shape == (1, 10)


def test_groupmixformer_interm_layers():
    m = GroupMixFormer(embedding_dims=(20, 20, 20, 20),
                       serial_depths=(1, 1, 1, 1), num_heads=4,
                       return_interm_layers=True)
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3))
    outs, _ = jax.eval_shape(lambda: m.init_with_output(jax.random.key(1), x))
    # Stages at /4, /8, /16, /32.
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
