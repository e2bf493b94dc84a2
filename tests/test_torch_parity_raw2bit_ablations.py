"""Golden-parity: the raw2bit ablation-class matrix (SURVEY.md §2.5) vs the
reference torch code, with weights mapped by
`convert_raw2bit_variant_state_dict`. Asserts y (analysis) and x_hat
(synthesis) for every constructible reference ablation class."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import ref_oracle

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not ref_oracle.available(), reason="reference checkout or torch unavailable")]


CFG = (1, 1, 1, 1, 1, 1, 1)

# (reference class, our factory, converter kwargs)
VARIANTS = [
    ("raw_compression_tcm", "raw_compression_tcm",
     dict(encoder_block="swin", use_gft=True, use_cadr=True,
          downs_inline=True)),
    ("raw_compression_tcm_xiaorong1", "raw_compression_tcm_xiaorong1",
     dict(encoder_block="conv", decoder_block="conv", hyper_a_block="conv",
          hyper_s_block="conv", use_gft=True, use_cadr=True,
          downs_inline=True)),
    ("raw_compression_tcm_xiaorong2", "raw_compression_tcm_xiaorong2",
     dict(encoder_block="conv", decoder_block="conv", hyper_a_block="conv",
          hyper_s_block="conv", use_gft=False, use_cadr=False,
          downs_inline=True)),
    ("raw_compression_tcm_final_xiaorong1",
     "raw_compression_tcm_final_xiaorong1",
     dict(encoder_block="swin", use_gft=False, use_cadr=True)),
    ("raw_compression_tcm_final_xiaorong2",
     "raw_compression_tcm_final_xiaorong2",
     dict(encoder_block="conv", decoder_block="conv", hyper_a_block="conv",
          hyper_s_block="conv", use_gft=False, use_cadr=True)),
    ("raw_compression_tcm_final_rcag", "raw_compression_tcm_final_rcag",
     dict(encoder_block="conv", decoder_block="rcag", hyper_a_block="conv",
          hyper_s_block="rcag", use_gft=False, use_cadr=False,
          stem="stride2")),
    ("raw_compression_tcm_final_xiaorong3",
     "raw_compression_tcm_final_xiaorong3",
     dict(encoder_block="conv", decoder_block="conv", use_gft=False,
          use_cadr=False, stem="stride2")),
    ("raw_compression_tcm_final_xiaorong3_",
     "raw_compression_tcm_final_xiaorong3_",
     dict(encoder_block="conv", decoder_block="conv", hyper_a_block="conv",
          hyper_s_block="conv", use_gft=False, use_cadr=False)),
]


@pytest.mark.parametrize("ref_name,ours_name,kw",
                         VARIANTS, ids=[v[1] for v in VARIANTS])
def test_ablation_parity(ref_name, ours_name, kw):
    import torch

    torch.manual_seed(0)
    rb = ref_oracle.load("raw2bit")
    from realcamnet_tpu.interop.torch_import import (
        convert_raw2bit_variant_state_dict,
    )
    from realcamnet_tpu.models.raw2bit import RAW2BIT_MODELS

    ref_cls = getattr(rb, ref_name)
    ref = ref_cls(config=list(CFG), head_dim=[8] * 7, N=32, M=320,
                  num_slices=5).eval()

    rng = np.random.default_rng(5)
    raw = rng.standard_normal((1, 256, 256, 4), np.float32) * 0.2
    cond = rng.standard_normal((1, 256, 256, 4), np.float32) * 0.2
    coord = rng.standard_normal((1, 256, 256, 2), np.float32)

    def t(a):
        return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        out_ref = ref([t(raw), t(cond), t(coord)])

    model = RAW2BIT_MODELS[ours_name](config=CFG, head_dim=(8,) * 7, n=32,
                                      m=320, num_slices=5)
    template = jax.eval_shape(model.init, jax.random.key(0),
                              jnp.asarray(raw), jnp.asarray(cond),
                              jnp.asarray(coord))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = convert_raw2bit_variant_state_dict(
        ref.state_dict(), template, config=CFG, **kw)
    out = jax.jit(lambda p, r, c, co: model.apply(p, r, c, co))(
        jax.tree.map(jnp.asarray, params), jnp.asarray(raw),
        jnp.asarray(cond), jnp.asarray(coord))

    def nhwc(x):
        return x.detach().numpy().transpose(0, 2, 3, 1)

    y_ours = out["y"] if "y" in out else out["para"]["y"]
    y_ref = out_ref["y"] if "y" in out_ref else out_ref["para"]["y"]
    np.testing.assert_allclose(np.asarray(y_ours), nhwc(y_ref),
                               atol=5e-4, err_msg="y (analysis)")
    np.testing.assert_allclose(np.asarray(out["x_hat"]),
                               nhwc(out_ref["x_hat"]), atol=5e-3,
                               err_msg="x_hat (synthesis)")
