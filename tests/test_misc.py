"""Config system, PreCoord, profiling utils, GDN/codec layers."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from realcamnet_tpu.core.config import ExperimentConfig, ModelConfig


def test_config_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(model=ModelConfig(name="raw_compression_tcm",
                                             kwargs={"n": 32}))
    p = tmp_path / "cfg.json"
    cfg.save(str(p))
    back = ExperimentConfig.load(str(p))
    assert back.model.name == "raw_compression_tcm"
    assert back.model.kwargs == {"n": 32}
    assert back.lambdas == cfg.lambdas


def test_precoord_shapes():
    from realcamnet_tpu.models.precoord import PreCoord

    m = PreCoord()
    x = jax.random.uniform(jax.random.key(0), (2, 64, 48, 4))
    out, _ = m.init_with_output(jax.random.key(1), x)
    assert out.shape == (2, 2)


def test_profile_model_flops():
    from realcamnet_tpu.ops.blocks import Conv2d
    from realcamnet_tpu.utils.profiling import profile_model

    m = Conv2d(8, 3, 1, 1)
    x = jnp.zeros((1, 16, 16, 4))
    costs = profile_model(m, x)
    assert costs["params"] == 4 * 8 * 9 + 8
    # 2 * H * W * Cin * Cout * k^2 MACs-ish; XLA reports >= matmul flops.
    assert costs["flops"] > 16 * 16 * 4 * 8 * 9


def test_gdn_inverse_roundtrip():
    from realcamnet_tpu.ops.codec_layers import GDN

    x = jax.random.uniform(jax.random.key(0), (1, 8, 8, 4)) + 0.1
    fwd = GDN(4, inverse=False)
    params = fwd.init(jax.random.key(1), x)
    y = fwd.apply(params, x)
    inv = GDN(4, inverse=True)
    back = inv.apply(params, y)
    # Not exactly inverse (norm computed on different inputs) but same
    # parametrization; check it's finite, positive-scaled, and grads flow.
    assert np.isfinite(np.asarray(y)).all()
    g = jax.grad(lambda p: jnp.sum(fwd.apply(p, x) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_lower_bound_gradient_semantics():
    from realcamnet_tpu.ops.bound import lower_bound

    f = lambda x: jnp.sum(lower_bound(x, 1.0))
    g = jax.grad(f)(jnp.array([0.5, 1.5]))
    # Below bound with positive incoming grad: blocked; above bound: passes.
    np.testing.assert_allclose(g, [0.0, 1.0])
    f2 = lambda x: jnp.sum(-lower_bound(x, 1.0))
    g2 = jax.grad(f2)(jnp.array([0.5, 1.5]))
    # Negative incoming grad (pushes x up): passes even below bound.
    np.testing.assert_allclose(g2, [-1.0, -1.0])


@pytest.mark.slow
def test_awnet_forward():
    """AWNet baseline (working reconstruction of the reference's dead class,
    `LiteISP.py:2221-2319`): packed raw -> sRGB at 2x."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realcamnet_tpu.models.liteisp import awnet

    m = awnet()
    raw = jnp.ones((1, 32, 32, 4), jnp.float32)
    v = jax.jit(m.init)(jax.random.key(0), raw)
    y = jax.jit(lambda v, x: m.apply(v, x))(v, raw)
    assert y.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_condition_net_forward():
    """ConditionNet (fixed legacy model, `LiteISP.py:165-212`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realcamnet_tpu.models.liteisp import ConditionNet

    m = ConditionNet(cond_c=8)
    content = jnp.ones((2, 16, 16, 3), jnp.float32)
    cond = jnp.ones((2, 32, 32, 4), jnp.float32)
    v = jax.jit(m.init)(jax.random.key(0), content, cond)
    y = jax.jit(lambda v, a, b: m.apply(v, a, b))(v, content, cond)
    assert y.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()
