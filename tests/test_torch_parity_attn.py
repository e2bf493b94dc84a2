"""Golden-parity: Swin WMSA and GMA attention vs the reference torch code.

These cover the most error-prone math in the codec/backbone stack: the
relative-position bias indexing, the shifted-window cyclic masks, and the
GroupMix aggregator / linear-attention / CRPE plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import ref_oracle

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not ref_oracle.available(), reason="reference checkout or torch unavailable")]


def _torch():
    import torch

    torch.manual_seed(0)
    return torch


def rand(*shape):
    return np.random.default_rng(7).standard_normal(shape, dtype=np.float32)


def _bhwc(x):
    import torch

    return torch.from_numpy(x)  # reference WMSA takes (B, H, W, C) directly


@pytest.mark.parametrize("wtype", ["W", "SW"])
def test_wmsa_parity(wtype):
    torch = _torch()
    tcm = ref_oracle.load("tcm")
    from realcamnet_tpu.interop.torch_import import _wmsa
    from realcamnet_tpu.ops.attention.wmsa import WMSA

    ref = tcm.WMSA(input_dim=32, output_dim=32, head_dim=8, window_size=4,
                   type=wtype).eval()
    sd = {f"g.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": _wmsa(sd, "g")}
    x = rand(2, 8, 12, 32)
    with torch.no_grad():
        ref_y = ref(_bhwc(x)).numpy()
    ours = WMSA(dim=32, head_dim=8, window_size=4, shifted=(wtype == "SW")).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=1e-5)


@pytest.mark.parametrize("wtype", ["W", "SW"])
def test_swin_block_parity(wtype):
    torch = _torch()
    tcm = ref_oracle.load("tcm")
    from realcamnet_tpu.interop.torch_import import _swin_block
    from realcamnet_tpu.ops.attention.wmsa import SwinTransformerBlock

    ref = tcm.Block(input_dim=32, output_dim=32, head_dim=8, window_size=4,
                    drop_path=0.0, type=wtype).eval()
    sd = {f"g.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": _swin_block(sd, "g")}
    x = rand(1, 8, 8, 32)
    with torch.no_grad():
        ref_y = ref(_bhwc(x)).numpy()
    ours = SwinTransformerBlock(dim=32, head_dim=8, window_size=4,
                                shifted=(wtype == "SW")).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=1e-5)


def test_efficient_att_parity():
    torch = _torch()
    gm = ref_oracle.load("groupmix")
    from realcamnet_tpu.interop.torch_import import _efficient_att
    from realcamnet_tpu.ops.attention.gma import EfficientAtt

    dim, heads, h, w = 40, 8, 6, 5
    ref = gm.EfficientAtt(dim, num_heads=heads, qkv_bias=True).eval()
    sd = {f"g.{k}": v for k, v in ref.state_dict().items()}
    params, stats = _efficient_att(sd, "g")
    x = rand(2, h, w, dim)
    with torch.no_grad():
        tokens = torch.from_numpy(x.reshape(2, h * w, dim))
        ref_y = ref(tokens, (h, w)).numpy().reshape(2, h, w, dim)
    ours = EfficientAtt(dim=dim, num_heads=heads).apply(
        jax.tree.map(jnp.asarray, {"params": params, "batch_stats": stats}),
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=1e-5)


def test_gma_block_parity():
    torch = _torch()
    gm = ref_oracle.load("groupmix")
    from realcamnet_tpu.interop.torch_import import _gma_block
    from realcamnet_tpu.ops.attention.gma import GMABlock

    dim, heads, h, w = 40, 8, 4, 4
    ref = gm.GMA_Block(dim, num_heads=heads, qkv_bias=True).eval()
    sd = {f"g.{k}": v for k, v in ref.state_dict().items()}
    params, stats = _gma_block(sd, "g")
    x = rand(1, h, w, dim)
    with torch.no_grad():
        tokens = torch.from_numpy(x.reshape(1, h * w, dim))
        ref_y = ref(tokens, (h, w)).numpy().reshape(1, h, w, dim)
    ours = GMABlock(dim=dim, num_heads=heads).apply(
        jax.tree.map(jnp.asarray, {"params": params, "batch_stats": stats}),
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=1e-5)


def test_groupmixformer_backbone_parity():
    """Full GroupMixFormer (2 small stages) vs the reference backbone,
    classifier head included."""
    torch = _torch()
    gm = ref_oracle.load("groupmix")
    from realcamnet_tpu.interop.torch_import import convert_groupmixformer_state_dict
    from realcamnet_tpu.models.groupmix import GroupMixFormer

    depths = (1, 1)
    ref = gm.GroupMixFormer(
        num_stages=2, embedding_dims=[40, 40, 40, 40],  # ref indexes [3] for the head
        serial_depths=list(depths),
        num_heads=8, mlp_ratios=[2, 2], num_classes=10, drop_path_rate=0.0,
    ).eval()
    params, stats = convert_groupmixformer_state_dict(ref.state_dict(), depths)
    x = rand(1, 32, 32, 3)
    with torch.no_grad():
        ref_y = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = GroupMixFormer(
        embedding_dims=(40, 40), serial_depths=depths, num_heads=8,
        mlp_ratios=(2, 2), num_classes=10, drop_path_rate=0.0,
    ).apply(jax.tree.map(jnp.asarray, {"params": params, "batch_stats": stats}),
            jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=1e-4)
