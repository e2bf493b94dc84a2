"""Forward tests for the ISP model zoo (oracle: shape/dtype contracts of the
reference forwards, SURVEY.md §4).

All 16 models are shape-checked via eval_shape (traces the full network, no
compile); numeric execution + grad is exercised on representative models to
keep CPU test time sane.
"""

import jax
import jax.numpy as jnp
import pytest

from realcamnet_tpu.models.liteisp import ISP_MODELS

pytestmark = pytest.mark.slow  # compile-heavy; run with -m slow or no -m filter



def _inputs(h=32, w=32, b=1):
    k = jax.random.key(0)
    raw = jax.random.uniform(k, (b, h, w, 4))
    cond = jax.random.uniform(k, (b, h, w, 4))
    coord = jax.random.uniform(k, (b, h, w, 2))
    return raw, cond, coord


@pytest.mark.parametrize("name", sorted(ISP_MODELS))
def test_forward_shape_traced(name):
    model = ISP_MODELS[name]()
    raw, cond, coord = _inputs()
    out, params = jax.eval_shape(
        lambda: model.init_with_output(jax.random.key(1), raw, cond, coord)
    )
    assert out.shape == (1, 64, 64, 3), f"{name}: {out.shape}"


@pytest.mark.parametrize("name", ["LiteISPNet_GFM_LSC", "ISPUNet_GFM_LSC", "ResUNet"])
def test_forward_numeric(name):
    model = ISP_MODELS[name]()
    raw, cond, coord = _inputs()
    out, _ = model.init_with_output(jax.random.key(1), raw, cond, coord)
    assert out.shape == (1, 64, 64, 3)
    assert jnp.all(jnp.isfinite(out))


def test_flagship_jit_and_grad():
    model = ISP_MODELS["LiteISPNet_GFM_LSC"]()
    raw, cond, coord = _inputs(32, 32)
    params = model.init(jax.random.key(0), raw, cond, coord)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, raw, cond, coord)
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert leaves and all(jnp.all(jnp.isfinite(l)) for l in leaves)


def test_flagship_train_mode_dropout_rng():
    model = ISP_MODELS["LiteISPNet_GFM_LSC"]()
    raw, cond, coord = _inputs(16, 16)
    params = model.init(jax.random.key(0), raw, cond, coord)
    out = model.apply(params, raw, cond, coord, train=True,
                      rngs={"dropout": jax.random.key(2)})
    assert out.shape == (1, 32, 32, 3)
