"""Golden-parity tests: our JAX ops/models vs the reference PyTorch code.

The reference checkout is imported (never copied) as a behavioral oracle via
tests/ref_oracle.py; random-initialized reference weights are converted with
realcamnet_tpu.interop and the two forwards must agree to float32 tolerance.
This validates both the op semantics and the checkpoint importer.
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


def nchw(x: np.ndarray):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def to_nhwc(t) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def rand(*shape):
    rng = np.random.default_rng(42)
    return rng.standard_normal(shape, dtype=np.float32)


def test_dwt_parity():
    torch = _torch()
    N = ref_oracle.load("networks")
    from realcamnet_tpu.ops.dwt import dwt_forward, dwt_inverse

    x = rand(2, 8, 8, 6)
    with torch.no_grad():
        ref_f = to_nhwc(N.DWTForward(6)(nchw(x)))
    ours_f = np.asarray(dwt_forward(jnp.asarray(x)))
    np.testing.assert_allclose(ours_f, ref_f, atol=1e-6)

    y = rand(2, 4, 4, 24)
    with torch.no_grad():
        ref_i = to_nhwc(N.DWTInverse(24)(nchw(y)))
    ours_i = np.asarray(dwt_inverse(jnp.asarray(y)))
    np.testing.assert_allclose(ours_i, ref_i, atol=1e-6)


def test_rcagroup_parity():
    torch = _torch()
    N = ref_oracle.load("networks")
    from realcamnet_tpu.interop.torch_import import _rcagroup
    from realcamnet_tpu.ops.blocks import RCAGroup

    ref = N.RCAGroup(in_channels=16, out_channels=16, nb=2).eval()
    sd = {f"g.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": _rcagroup(sd, "g", nb=2)}
    x = rand(1, 8, 8, 16)
    with torch.no_grad():
        ref_y = to_nhwc(ref(nchw(x)))
    ours = RCAGroup(channels=16, nb=2).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=1e-5)


def test_res_gfm_parity():
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import _res_gfm
    from realcamnet_tpu.ops.modulation import ResGFM

    ref = li.Res_GFM(in_nc=16, chan=16, cond_c=8, out_nc=16, nf=24).eval()
    sd = {f"g.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": _res_gfm(sd, "g")}
    x, vec = rand(2, 8, 8, 16), rand(2, 8)
    with torch.no_grad():
        ref_y = to_nhwc(ref((nchw(x), torch.from_numpy(vec)))[0])
    ours = ResGFM(chan=16, nf=24).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), jnp.asarray(vec))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=1e-5)


def test_color_condition_gfm_parity():
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import _color_condition_gfm
    from realcamnet_tpu.ops.color import ColorConditionGFM

    ref = li.Color_Condition_GFM(in_channels=4, out_c=32).eval()
    sd = {f"g.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": _color_condition_gfm(sd, "g")}
    x = rand(2, 64, 64, 4)
    with torch.no_grad():
        ref_y = ref(nchw(x)).squeeze(-1).squeeze(-1).numpy()
    ours = ColorConditionGFM(out_c=32).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=1e-5)


def test_lsc_parity():
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import _lsc
    from realcamnet_tpu.ops.modulation import LensShadingCorrection

    ref = li.Lens_Shading_Correction(in_channels=2, out_c=48, nf=48).eval()
    sd = {f"g.{k}": v for k, v in ref.state_dict().items()}
    params = {"params": _lsc(sd, "g")}
    coord = rand(1, 16, 16, 2)
    with torch.no_grad():
        ref_y = to_nhwc(ref(nchw(coord)))
    ours = LensShadingCorrection(out_c=48, nf=48).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(coord))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=1e-5)


def test_flagship_liteisp_full_parity():
    """End-to-end: reference LiteISPNet_GFM_LSC forward == ours with converted
    weights. This is the strongest available oracle for the ISP stack
    (covers head/LSC/GFM/RCAGroups/DWT/PixelShuffle and the skip topology)."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_liteisp_state_dict
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_lsc

    ref = li.LiteISPNet_GFM_LSC().eval()
    params = convert_liteisp_state_dict(ref.state_dict())

    raw, cond, coord = rand(1, 32, 32, 4), rand(1, 64, 64, 4), rand(1, 32, 32, 2)
    with torch.no_grad():
        ref_y = to_nhwc(ref([nchw(raw), nchw(cond), nchw(coord)]))

    model = lite_isp_net_gfm_lsc()
    ours = model.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(raw),
                       jnp.asarray(cond), jnp.asarray(coord))
    assert ours.shape == ref_y.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-4)


def test_liteisp_lsc_variant_parity():
    """`LiteISPNet_LSC` (no GFM) through the same converter flags."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_liteisp_state_dict
    from realcamnet_tpu.models.liteisp import lite_isp_net_lsc

    ref = li.LiteISPNet_LSC().eval()
    params = convert_liteisp_state_dict(ref.state_dict(), use_gfm=False)

    raw, coord = rand(1, 32, 32, 4), rand(1, 32, 32, 2)
    with torch.no_grad():
        ref_y = to_nhwc(ref([nchw(raw), None, nchw(coord)]))
    ours = lite_isp_net_lsc().apply(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(raw), None, jnp.asarray(coord))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-4)


def test_ispunet_gfm_lsc_full_parity():
    """End-to-end: reference ISPUNet_GFM_LSC (`LiteISP.py:1228-1379`) ==
    our ISPUNet with converted weights (stride-conv UNet + GFM + LSC +
    decoder modulations + PixelShuffle ups)."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_ispunet_state_dict
    from realcamnet_tpu.models.liteisp import isp_unet_gfm_lsc

    ref = li.ISPUNet_GFM_LSC(cond_c=16, chan=16, m_blocks=2).eval()
    params = convert_ispunet_state_dict(ref.state_dict(), modulation_blocks=2)

    raw, cond, coord = rand(1, 32, 32, 4), rand(1, 64, 64, 4), rand(1, 32, 32, 2)
    with torch.no_grad():
        ref_y = to_nhwc(ref([nchw(raw), nchw(cond), nchw(coord)]))
    ours = isp_unet_gfm_lsc(cond_c=16, chan=16, m_blocks=2).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(raw),
        jnp.asarray(cond), jnp.asarray(coord))
    assert ours.shape == ref_y.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-4)


def test_resunet_parity():
    """Plain `ResUNet` baseline (`LiteISP.py:2038-2146`), no conditioning."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_ispunet_state_dict
    from realcamnet_tpu.models.liteisp import res_unet

    ref = li.ResUNet().eval()
    params = convert_ispunet_state_dict(ref.state_dict(), use_gfm=False,
                                        use_lsc=False)
    raw = rand(1, 16, 16, 4)
    with torch.no_grad():
        ref_y = to_nhwc(ref([nchw(raw)]))
    ours = res_unet().apply(jax.tree.map(jnp.asarray, params), jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-4)


def test_ispunet_gfm_lsc1_concat_parity():
    """`ISPUNet_GFM_LSC1` (`LiteISP.py:1382-1532`): coord map concatenated
    into the input instead of the LSC gain."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_ispunet_state_dict
    from realcamnet_tpu.models.liteisp import isp_unet_gfm_lsc1

    ref = li.ISPUNet_GFM_LSC1().eval()
    params = convert_ispunet_state_dict(ref.state_dict(), use_lsc=False,
                                        modulation_blocks=2)
    raw, cond, coord = rand(1, 16, 16, 4), rand(1, 32, 32, 4), rand(1, 16, 16, 2)
    with torch.no_grad():
        ref_y = to_nhwc(ref([nchw(raw), nchw(cond), nchw(coord)]))
    ours = isp_unet_gfm_lsc1().apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(raw),
        jnp.asarray(cond), jnp.asarray(coord))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-4)
