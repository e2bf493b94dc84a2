"""LPIPS metric tests: structural/property checks (no pretrained weights in
this environment; load_torch_lpips is exercised via a synthetic torch-format
checkpoint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realcamnet_tpu.evaluation.lpips import (
    ALEX_CHANNELS,
    VGG_CHANNELS,
    alexnet_features,
    init_lpips_params,
    load_torch_lpips,
    lpips,
    vgg16_features,
)


@pytest.mark.parametrize("net,chans", [("alex", ALEX_CHANNELS),
                                       ("vgg", VGG_CHANNELS)])
def test_feature_taps(net, chans):
    params = init_lpips_params(jax.random.key(0), net=net)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    extract = alexnet_features if net == "alex" else vgg16_features
    feats = extract(params["net"], x)
    assert len(feats) == len(chans)
    for f, c in zip(feats, chans):
        assert f.shape[-1] == c


def test_lpips_identity_zero_and_symmetry():
    params = init_lpips_params(jax.random.key(0), net="alex")
    a = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    b = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    d_aa = float(jax.jit(lpips, static_argnames="net")(a, a, params))
    d_ab = float(lpips(a, b, params))
    d_ba = float(lpips(b, a, params))
    assert abs(d_aa) < 1e-6
    assert d_ab > 0
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_lpips_monotone_in_noise():
    params = init_lpips_params(jax.random.key(0), net="alex")
    a = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    noise = jax.random.normal(jax.random.key(2), a.shape)
    d_small = float(lpips(a, jnp.clip(a + 0.02 * noise, 0, 1), params))
    d_big = float(lpips(a, jnp.clip(a + 0.2 * noise, 0, 1), params))
    assert d_big > d_small


def test_load_torch_lpips_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    # Build a synthetic full-LPIPS state dict in the pip package's layout
    # (net.sliceK.IDX.{weight,bias} + linI.model.1.weight) for alexnet.
    rng = np.random.RandomState(0)
    sd = {}
    alex_plan = [  # (slice, idx, in_c, out_c, k)
        (1, 0, 3, 64, 11),
        (2, 3, 64, 192, 5),
        (3, 6, 192, 384, 3),
        (4, 8, 384, 256, 3),
        (5, 10, 256, 256, 3),
    ]
    for s, i, ic, oc, k in alex_plan:
        sd[f"net.slice{s}.{i}.weight"] = torch.tensor(
            rng.randn(oc, ic, k, k).astype(np.float32))
        sd[f"net.slice{s}.{i}.bias"] = torch.tensor(
            rng.randn(oc).astype(np.float32))
    for i, c in enumerate(ALEX_CHANNELS):
        sd[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.randn(1, c, 1, 1)).astype(np.float32))
    path = str(tmp_path / "lpips_alex.pth")
    torch.save(sd, path)

    params = load_torch_lpips(path, net="alex")
    assert len(params["lins"]) == len(ALEX_CHANNELS)
    assert params["net"]["conv0"]["w"].shape == (11, 11, 3, 64)
    a = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    b = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    assert float(lpips(a, b, params)) > 0
