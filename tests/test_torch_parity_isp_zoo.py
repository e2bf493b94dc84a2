"""Golden parity for the last uncovered ISP-zoo models (VERDICT r1 item #6):
ISPNet_gfm, ISPNet_modulation, ISPUNet_GFM_LFM, MWISP, LiteISPNet_GFMresize.

Reference torch classes are imported as oracles (never copied); their
random-init state dicts go through realcamnet_tpu.interop converters and the
forwards must agree to float32 tolerance.
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
    rng = np.random.default_rng(7)
    return rng.standard_normal(shape, dtype=np.float32)


def _apply(model, params, *args):
    return model.apply(jax.tree.map(jnp.asarray, params),
                       *[None if a is None else jnp.asarray(a) for a in args])


def test_ispnet_gfm_parity():
    """Flat `ISPNet_gfm` (`LiteISP.py:624-658`): intro + 6x Res_GFM +
    PixelShuffle ending + GFM on RGB."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_ispnet_gfm_state_dict
    from realcamnet_tpu.models.liteisp import isp_net_gfm

    ref = li.ISPNet_gfm().eval()
    params = convert_ispnet_gfm_state_dict(ref.state_dict())
    raw, cond = rand(1, 16, 16, 4), rand(1, 64, 64, 4)
    with torch.no_grad():
        # The reference forward (`LiteISP.py:646-657`) feeds Res_GFM's
        # (fea, cond) tuple back into the next layer without unpacking and
        # crashes in torch; drive the oracle stepwise with the intended
        # unpacking instead (SURVEY.md §0.1 bug class).
        fea = ref.intro(nchw(raw))
        vec = ref.classifier(nchw(cond)).squeeze(3).squeeze(2)
        for k in range(1, 7):
            fea, _ = getattr(ref, f"GFM_layer{k}")((fea, vec))
        fea = ref.ending(fea)
        ref_y = to_nhwc(ref.GFM_last((fea, vec)))
    ours = _apply(isp_net_gfm(), params, raw, cond)
    assert ours.shape == ref_y.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-4)


def test_ispnet_modulation_parity():
    """`ISPNet_modulation` (`LiteISP.py:662-808`): multi-scale Color_Condition
    + ResBlock_with_modulation (GFM+SFT) UNet."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_ispunet_state_dict
    from realcamnet_tpu.models.liteisp import isp_net_modulation

    ref = li.ISPNet_modulation().eval()
    params = convert_ispunet_state_dict(
        ref.state_dict(), use_lsc=False, modulation="multiscale",
        modulation_blocks=2, middle_nb_mult=1)
    raw, cond = rand(1, 16, 16, 4), rand(1, 32, 32, 4)
    with torch.no_grad():
        ref_y = to_nhwc(ref([nchw(raw), nchw(cond)]))
    ours = _apply(isp_net_modulation(), params, raw, cond)
    assert ours.shape == ref_y.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-4)


def test_ispunet_gfm_lfm_parity():
    """`ISPUNet_GFM_LFM` (`LiteISP.py:1535-1707`): Color_Condition_GFM_LFM
    global+local conditioning, Res_GFM_LFM modulation, top-level CondNets."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_ispunet_state_dict
    from realcamnet_tpu.models.liteisp import isp_unet_gfm_lfm

    ref = li.ISPUNet_GFM_LFM().eval()
    params = convert_ispunet_state_dict(
        ref.state_dict(), use_lsc=False, modulation="gfm_lfm",
        modulation_blocks=1)
    # cond (the global raw) needs /64 headroom for the 6 CB downblocks.
    raw, cond = rand(1, 16, 16, 4), rand(1, 64, 64, 4)
    with torch.no_grad():
        ref_y = to_nhwc(ref([nchw(raw), nchw(cond)]))
    ours = _apply(isp_unet_gfm_lfm(), params, raw, cond)
    assert ours.shape == ref_y.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-4)


def test_mwisp_parity():
    """`MWISP` (`LiteISP.py:2149-2218`): DWT pyramid + nb=20 RCAGroups +
    PReLU activations."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_mwisp_state_dict
    from realcamnet_tpu.models.liteisp import mwisp

    ref = li.MWISP().eval()
    params = convert_mwisp_state_dict(ref.state_dict())
    raw = rand(1, 16, 16, 4)
    with torch.no_grad():
        ref_y = to_nhwc(ref([nchw(raw)]))
    ours = _apply(mwisp(), params, raw)
    assert ours.shape == ref_y.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=5e-4)


def test_liteisp_gfmresize_parity():
    """`LiteISPNet_GFMresize` (`LiteISP.py:2414-2520`): self-conditioned
    LiteISP layout; the existing LiteISP converter covers it with
    use_lsc=False."""
    torch = _torch()
    li = ref_oracle.load("LiteISP")
    from realcamnet_tpu.interop.torch_import import convert_liteisp_state_dict
    from realcamnet_tpu.models.liteisp import lite_isp_net_gfm_resize

    ref = li.LiteISPNet_GFMresize().eval()
    params = convert_liteisp_state_dict(ref.state_dict(), use_lsc=False)
    raw = rand(1, 32, 32, 4)
    with torch.no_grad():
        ref_y = to_nhwc(ref([nchw(raw)]))
    ours = _apply(lite_isp_net_gfm_resize(), params, raw)
    assert ours.shape == ref_y.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-4)
