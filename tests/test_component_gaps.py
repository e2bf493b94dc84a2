"""Round-2 component-gap closures: ConvGMABlock encoder, SFT 'cbam' branch,
and the weight-init zoo (VERDICT.md missing/weak items)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from realcamnet_tpu.models.raw2bit import (
    ConvGMABlock,
    RAW2BIT_MODELS,
)
from realcamnet_tpu.ops.init import init_weights
from realcamnet_tpu.ops.modulation import SpatialFeatureTransform


def test_conv_gma_block_shapes():
    """Reference smoke config ConvGMABlock(64, 80, 10) (`raw2bit.py:4362`)."""
    blk = ConvGMABlock(64, 80, 10)
    x = jnp.ones((1, 16, 16, 144))
    params = blk.init(jax.random.key(0), x)
    out = blk.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_gma_encoder_model_traces():
    model = RAW2BIT_MODELS["raw_compression_tcm_gma_encoder"](
        config=(1, 1, 1, 1, 1, 1), head_dim=(32,) * 6, n=64, m=80)
    raw = jnp.ones((1, 64, 64, 4))
    coord = jnp.ones((1, 64, 64, 2))
    out = jax.eval_shape(
        lambda: model.init_with_output(jax.random.key(0), raw, raw, coord)[0])
    assert out["x_hat"].shape == (1, 128, 128, 3)


def test_sft_cbam_branch():
    sft = SpatialFeatureTransform(16, ada_method="cbam")
    fea = jnp.ones((1, 8, 8, 16))
    cond = jnp.ones((1, 8, 8, 8))
    params = sft.init(jax.random.key(0), fea, cond)
    names = set(params["params"].keys())
    assert "scale_cbam" in names and "shift_cbam" in names
    out = sft.apply(params, fea, cond)
    assert out.shape == fea.shape


def test_init_zoo():
    from realcamnet_tpu.ops.blocks import RCAGroup

    mod = RCAGroup(channels=8, nb=1, reduction=4)
    x = jnp.ones((1, 8, 8, 8))
    params = mod.init(jax.random.key(0), x)["params"]
    for kind in ("normal", "xavier", "kaiming", "orthogonal", "uniform"):
        new = init_weights(params, jax.random.key(1), kind, gain=0.02)
        flat_old = traverse_util.flatten_dict(params)
        flat_new = traverse_util.flatten_dict(new)
        assert flat_old.keys() == flat_new.keys()
        changed = 0
        for k in flat_old:
            assert flat_old[k].shape == flat_new[k].shape
            if k[-1] == "kernel":
                changed += not np.allclose(np.asarray(flat_old[k]),
                                           np.asarray(flat_new[k]))
            if k[-1] == "bias":
                assert np.all(np.asarray(flat_new[k]) == 0)
        assert changed > 0, kind
    # orthogonal kernels: flattened columns orthonormal (up to gain)
    ortho = init_weights(params, jax.random.key(2), "orthogonal", gain=1.0)
    k = traverse_util.flatten_dict(ortho)[
        ("rcab0", "res", "0_conv", "conv", "kernel")]
    m = np.asarray(k).reshape(-1, k.shape[-1])
    gram = m.T @ m
    np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-4)


class TestCompressAILayerGaps:
    """r3: MaskedConv2d + deconv (CompressAI imports at `raw2bit.py:11-12`,
    unused by constructed reference models but part of the layer contract)."""

    def test_masked_conv_parity_vs_torch(self):
        import torch
        import torch.nn as tnn

        from realcamnet_tpu.ops.codec_layers import MaskedConv2d

        x = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
        for mtype in ("A", "B"):
            m = MaskedConv2d(4, 5, mtype)
            p = m.init(jax.random.key(0), jnp.asarray(x))
            y = np.asarray(m.apply(p, jnp.asarray(x)))
            tc = tnn.Conv2d(3, 4, 5, padding=2)
            w = np.transpose(np.asarray(p["params"]["kernel"]),
                             (3, 2, 0, 1)).copy()
            mask = np.ones_like(w)
            mask[:, :, 2, 2 + (1 if mtype == "B" else 0):] = 0
            mask[:, :, 3:] = 0
            tc.weight.data = torch.from_numpy(w * mask)
            tc.bias.data = torch.from_numpy(
                np.asarray(p["params"]["bias"]).copy())
            yr = tc(torch.from_numpy(
                np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
            np.testing.assert_allclose(np.transpose(yr, (0, 2, 3, 1)), y,
                                       atol=1e-6)

    def test_masked_conv_is_causal(self):
        from realcamnet_tpu.ops.codec_layers import MaskedConv2d

        m = MaskedConv2d(2, 5, "A")
        x0 = np.zeros((1, 9, 9, 2), np.float32)
        p = m.init(jax.random.key(1), jnp.asarray(x0))
        # Perturb the center pixel: outputs at/before it (raster order) must
        # be unchanged for mask 'A'.
        x1 = x0.copy()
        x1[0, 4, 4] = 7.0
        a = np.asarray(m.apply(p, jnp.asarray(x0)))
        b = np.asarray(m.apply(p, jnp.asarray(x1)))
        assert np.array_equal(a[0, :4], b[0, :4])        # rows above
        assert np.array_equal(a[0, 4, :5], b[0, 4, :5])  # incl. center ('A')
        assert not np.array_equal(a, b)                  # later pixels see it

    def test_deconv_parity_vs_torch(self):
        import torch
        import torch.nn as tnn

        from realcamnet_tpu.ops.codec_layers import Deconv

        x = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
        d = Deconv(6, 5, 2)
        p = d.init(jax.random.key(1), jnp.asarray(x))
        y = np.asarray(d.apply(p, jnp.asarray(x)))
        assert y.shape == (1, 16, 16, 6)
        k = np.asarray(p["params"]["deconv"]["kernel"])
        t = tnn.ConvTranspose2d(3, 6, 5, stride=2, padding=2,
                                output_padding=1)
        t.weight.data = torch.from_numpy(
            np.transpose(k[::-1, ::-1], (2, 3, 0, 1)).copy())
        t.bias.data = torch.from_numpy(
            np.asarray(p["params"]["deconv"]["bias"]).copy())
        yr = t(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
        np.testing.assert_allclose(np.transpose(yr, (0, 2, 3, 1)), y,
                                   atol=1e-5)


class TestLftFusedPath:
    """r4: LFT UNet full-res segments in BHCW (the 46 ms encoder item,
    codec_roofline_r04.json) must match the plain path exactly."""

    def test_hybrid_condition_fused_parity(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from realcamnet_tpu.ops.color import HybridConditionModule

        m0 = HybridConditionModule(64, 16)
        m1 = HybridConditionModule(64, 16, fused=True)
        raw = jax.random.uniform(jax.random.key(1), (1, 64, 48, 4))
        p = m0.init(jax.random.key(2), raw)
        for u, v in zip(m0.apply(p, raw), m1.apply(p, raw)):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-5)

    def test_upsample_bhcw_matches_nhwc(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from realcamnet_tpu.ops.blocks import (upsample_bilinear,
                                               upsample_bilinear_bhcw)

        x = jax.random.uniform(jax.random.key(0), (2, 6, 10, 5))
        a = upsample_bilinear(x, 2, align_corners=True)
        b = jnp.transpose(
            upsample_bilinear_bhcw(jnp.transpose(x, (0, 1, 3, 2)), 2, True),
            (0, 1, 3, 2))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
