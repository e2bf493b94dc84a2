"""RD evaluation: per-image metrics, dataset sweeps over lambda points, and
real-bitstream verification (SURVEY.md §7.1 step 6).

Two rate measurements:
- 'estimated': bpp from likelihoods in the eval forward (standard proxy).
- 'real': actual rANS byte counts via ChARMCodec (requires update()).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from realcamnet_tpu.evaluation.metrics import (
    bpp_from_likelihoods,
    delta_e_ciede2000,
    ms_ssim_db,
    psnr,
)


def _make_eval_fn(model, lpips_params=None, lpips_net: str = "alex",
                  inputs=("raw", "cond", "coord")):
    from realcamnet_tpu.evaluation.lpips import lpips as lpips_fn

    @jax.jit
    def run(p, *args):
        *ins, target = args
        out = model.apply(p, *ins)
        x_hat = jnp.clip(out["x_hat"], 0.0, 1.0)
        num_px = target.shape[0] * target.shape[1] * target.shape[2]
        m = {
            "psnr": psnr(x_hat, target),
            "ms_ssim_db": ms_ssim_db(x_hat, target),
            "delta_e": delta_e_ciede2000(x_hat, target),
            "bpp": bpp_from_likelihoods(out["likelihoods"], num_px),
        }
        if lpips_params is not None:
            m["lpips"] = jnp.mean(lpips_fn(x_hat, target, lpips_params,
                                           net=lpips_net))
        return m

    return run


def eval_forward_metrics(model, params, batch: Dict, _fn=None,
                         inputs=("raw", "cond", "coord")) -> Dict[str, float]:
    """Eval-mode forward metrics for one batch (jitted)."""
    run = _fn if _fn is not None else _make_eval_fn(model, inputs=inputs)
    m = run(params, *[batch[k] for k in inputs], batch["target"])
    return {k: float(v) for k, v in jax.device_get(m).items()}


def eval_dataset(model, params, batches: Iterable[Dict],
                 lpips_params=None, lpips_net: str = "alex",
                 inputs=("raw", "cond", "coord")) -> Dict[str, float]:
    """Mean metrics over an iterable of batches. Pass `lpips_params` (from
    evaluation.lpips init_lpips_params / load_torch_lpips) to add the RD
    curve's LPIPS axis (reference rdcurve.png bottom-left panel).""" 
    run = _make_eval_fn(model, lpips_params, lpips_net,
                        inputs=inputs)  # one jit, all batches
    acc: Dict[str, float] = {}
    n = 0
    for batch in batches:
        m = eval_forward_metrics(model, params, batch, _fn=run,
                                 inputs=inputs)
        for k, v in m.items():
            acc[k] = acc.get(k, 0.0) + v
        n += 1
    return {k: v / max(n, 1) for k, v in acc.items()}


def eval_real_bitstream(model, params, batch: Dict, codec=None,
                        inputs=("raw", "cond", "coord")) -> Dict[str, float]:
    """Compress+decompress through the actual rANS coder; returns real bpp
    and reconstruction metrics. Pass a prebuilt/updated `codec` to amortize
    CDF-table construction across images."""
    from realcamnet_tpu.entropy.codec import ChARMCodec

    if codec is None:
        codec = ChARMCodec(model, params)
        codec.update()
    ins = [jnp.asarray(batch[k]) for k in inputs]
    target = batch["target"]
    assert ins[0].shape[0] == 1, "real-bitstream eval is per-image"
    out = codec.compress(*ins)
    nbytes = sum(len(s[0]) for s in out["strings"])
    dec = codec.decompress(out["strings"], out["shape"])
    x_hat = jnp.clip(dec["x_hat"], 0.0, 1.0)
    target = jnp.asarray(target)
    num_px = target.shape[1] * target.shape[2]
    return {
        "bpp_real": nbytes * 8.0 / num_px,
        "psnr": float(psnr(x_hat, target)),
        "ms_ssim_db": float(ms_ssim_db(x_hat, target)),
        "delta_e": float(delta_e_ciede2000(x_hat, target)),
        "bytes": float(nbytes),
    }


def eval_real_bitstream_set(model, params, batches: Iterable[Dict],
                            inputs=("raw", "cond", "coord")) -> Dict[str, float]:
    """Real-bitstream verification over a whole eval set (one codec/update,
    reused). Returns mean metrics plus the distribution of the real-vs-
    estimated bpp gap across images (VERDICT r2 weak #9: one image is not a
    verification of the eval set)."""
    from realcamnet_tpu.entropy.codec import ChARMCodec

    codec = ChARMCodec(model, params)
    codec.update()
    run = _make_eval_fn(model, inputs=inputs)
    per_img = []
    for batch in batches:
        rb = eval_real_bitstream(model, params, batch, codec=codec,
                                 inputs=inputs)
        est = eval_forward_metrics(model, params, batch, _fn=run,
                                   inputs=inputs)
        rb["bpp_est"] = est["bpp"]
        rb["bpp_gap_pct"] = 100.0 * (rb["bpp_real"] - est["bpp"]) / max(est["bpp"], 1e-9)
        per_img.append(rb)
    n = len(per_img)
    out: Dict[str, float] = {}
    for k in per_img[0]:
        vals = np.array([p[k] for p in per_img], np.float64)
        out[k] = float(vals.mean())
        if k == "bpp_gap_pct":
            out["bpp_gap_pct_std"] = float(vals.std())
            out["bpp_gap_pct_max"] = float(vals.max())
    out["num_images"] = float(n)
    return out
