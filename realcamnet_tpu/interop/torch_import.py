"""Import reference PyTorch checkpoints into realcamnet_tpu flax params.

The reference (kepengxu/RealCamNet) ships models whose state dicts follow the
`N.seq`/`N.conv` naming of `models/networks.py:117-221` and the module layout
of `models/LiteISP.py`. This module maps those tensors (OIHW convs, (out,in)
linears) onto our NHWC flax parameter pytrees so a user of the reference can
bring trained weights straight onto TPU.

Covered: the full `LiteISPNet*` family (`LiteISP.py:1710-2035,2322-2520`) —
flagship `LiteISPNet_GFM_LSC` included. The mapping is validated bit-for-bit
against the reference torch forward in `tests/test_torch_parity.py`.

No torch import is required here: state dicts are accepted as any mapping of
name -> array-convertible (torch.Tensor works via `.detach().cpu().numpy()`;
a plain dict of numpy arrays works too).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch.Tensor without importing torch
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_params(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    """torch Conv2d weights at `key` -> flax nn.Conv dict (OIHW -> HWIO)."""
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def dense_params(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear at `key` -> flax nn.Dense dict ((out,in) -> (in,out))."""
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def instancenorm_params(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _conv(sd, key):
    return {"conv": conv_params(sd, key)}


def _dense(sd, key):
    return {"dense": dense_params(sd, key)}


def layernorm_params(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def batchnorm_params(sd: Mapping[str, Any], key: str):
    """torch BatchNorm/SyncBatchNorm -> (flax params, flax batch_stats)."""
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {"mean": _np(sd[f"{key}.running_mean"]),
             "var": _np(sd[f"{key}.running_var"])}
    return params, stats


def _separable(sd: Mapping[str, Any], key: str) -> Dict[str, Any]:
    """Reference `SeparableConv2d` (groupmix.py:240-249) -> our SeparableConv."""
    return {"dw": _conv(sd, f"{key}.conv1"),
            "pw": _conv(sd, f"{key}.pointwise_conv")}


def _wmsa(sd: Mapping[str, Any], key: str) -> Dict[str, Any]:
    """Reference Swin `WMSA` (tcm.py:139-212) -> our WMSA: qkv/proj linears +
    relative-position bias table ((heads, 2w-1, 2w-1) -> (2w-1, 2w-1, heads))."""
    return {
        "qkv": dense_params(sd, f"{key}.embedding_layer"),
        "proj": dense_params(sd, f"{key}.linear"),
        "rel_pos_bias": _np(sd[f"{key}.relative_position_params"]).transpose(1, 2, 0),
    }


def _swin_block(sd: Mapping[str, Any], key: str) -> Dict[str, Any]:
    """Reference `Block` (tcm.py:214-236) -> our SwinTransformerBlock."""
    return {
        "ln1": layernorm_params(sd, f"{key}.ln1"),
        "msa": _wmsa(sd, f"{key}.msa"),
        "ln2": layernorm_params(sd, f"{key}.ln2"),
        "mlp0": dense_params(sd, f"{key}.mlp.0"),
        "mlp1": dense_params(sd, f"{key}.mlp.2"),
    }


def _efficient_att(sd: Mapping[str, Any], key: str):
    """Reference GMA `EfficientAtt` (groupmix.py:159-200) -> our EfficientAtt.
    Returns (params, batch_stats) — the aggregator uses (Sync)BatchNorm."""
    agg: Dict[str, Any] = {
        "agg0_conv": _separable(sd, f"{key}.aggregator.agg0.conv"),
        "agg0_norm": layernorm_params(sd, f"{key}.aggregator.agg0.norm"),
    }
    stats: Dict[str, Any] = {"aggregator": {}}
    for i in range(4):
        p, s = batchnorm_params(sd, f"{key}.aggregator.norm{i}")
        agg[f"norm{i}"] = {"bn": p}
        stats["aggregator"][f"norm{i}"] = {"bn": s}
        if i > 0:
            agg[f"agg{i}"] = _separable(sd, f"{key}.aggregator.agg{i}")
    crpe = {f"conv{win}": _conv(sd, f"{key}.crpe.conv_list.{i}")
            for i, win in enumerate((3, 5, 7))}
    params = {
        "qkv": dense_params(sd, f"{key}.qkv"),
        "proj": dense_params(sd, f"{key}.proj"),
        "aggregator": agg,
        "crpe": crpe,
    }
    return params, stats


def _gma_block(sd: Mapping[str, Any], key: str):
    """Reference `GMA_Block` (groupmix.py:274-299) -> our GMABlock.
    Returns (params, batch_stats)."""
    att, att_stats = _efficient_att(sd, f"{key}.att")
    params = {
        "cpe": {"proj": _conv(sd, f"{key}.cpe.proj")},
        "norm1": layernorm_params(sd, f"{key}.norm1"),
        "att": att,
        "norm2": layernorm_params(sd, f"{key}.norm2"),
        "mlp0": dense_params(sd, f"{key}.mlp.fc1"),
        "mlp1": dense_params(sd, f"{key}.mlp.fc2"),
    }
    return params, {"att": att_stats}


def convert_groupmixformer_state_dict(
    sd: Mapping[str, Any],
    serial_depths=(2, 4, 12, 4),
    return_interm_layers: bool = False,
):
    """Reference `GroupMixFormer` (groupmix.py:330-436) torch state dict ->
    (flax params, batch_stats) for our models.groupmix.GroupMixFormer."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    stem_p: Dict[str, Any] = {}
    stem_s: Dict[str, Any] = {}
    for i in (1, 2):
        stem_p[f"proj{i}"] = _conv(sd, f"conv_stem.proj{i}")
        bp, bs = batchnorm_params(sd, f"conv_stem.norm{i}")
        stem_p[f"bn{i}"] = {"bn": bp}
        stem_s[f"bn{i}"] = {"bn": bs}
    params["conv_stem"] = stem_p
    stats["conv_stem"] = stem_s

    for s in range(len(serial_depths)):
        pe_p: Dict[str, Any] = {"proj": _separable(sd, f"patch_embed_layers.{s}.proj")}
        bp, bs = batchnorm_params(sd, f"patch_embed_layers.{s}.norm")
        pe_p["bn"] = {"bn": bp}
        params[f"patch_embed{s}"] = pe_p
        stats[f"patch_embed{s}"] = {"bn": {"bn": bs}}
        for d in range(serial_depths[s]):
            bp2, bs2 = _gma_block(sd, f"groupmixformer_backbone.{s}.gma_stage.{d}")
            params[f"stage{s}_block{d}"] = bp2
            stats[f"stage{s}_block{d}"] = bs2

    if not return_interm_layers:
        bp, bs = batchnorm_params(sd, "norm4")
        params["norm4"] = {"bn": bp}
        stats["norm4"] = {"bn": bs}
        params["head"] = dense_params(sd, "head")
    return params, stats


def _rcagroup(sd: Mapping[str, Any], key: str, nb: int) -> Dict[str, Any]:
    """Reference `N.RCAGroup` (networks.py:317-335): rg.{i} = RCABlock
    {res.0, res.2 convs ('CRC'), ca.conv_du.{0,2}}, rg.{nb} trailing conv."""
    out: Dict[str, Any] = {}
    for i in range(nb):
        out[f"rcab{i}"] = {
            "res": {"0_conv": _conv(sd, f"{key}.rg.{i}.res.0"),
                    "2_conv": _conv(sd, f"{key}.rg.{i}.res.2")},
            "ca": {"down": _conv(sd, f"{key}.rg.{i}.ca.conv_du.0"),
                   "up": _conv(sd, f"{key}.rg.{i}.ca.conv_du.2")},
        }
    out["tail"] = _conv(sd, f"{key}.rg.{nb}")
    return out


def _res_gfm(sd: Mapping[str, Any], key: str) -> Dict[str, Any]:
    """Reference `Res_GFM` (LiteISP.py:537-559) -> our ResGFM."""
    return {
        "conv0": _conv(sd, f"{key}.conv0"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "scale0": _dense(sd, f"{key}.GFM_scale_conv0"),
        "scale1": _dense(sd, f"{key}.GFM_scale_conv1"),
        "shift0": _dense(sd, f"{key}.GFM_shift_conv0"),
        "shift1": _dense(sd, f"{key}.GFM_shift_conv1"),
    }


def _color_condition_gfm(sd: Mapping[str, Any], key: str) -> Dict[str, Any]:
    """Reference `Color_Condition_GFM` (LiteISP.py:345-361): sequential indexes
    conv@{0,4,8,12,16}, InstanceNorm@{3,7,11,15}, final 1x1 conv@20."""
    out: Dict[str, Any] = {}
    conv_idx = (0, 4, 8, 12, 16)
    norm_idx = (3, 7, 11, 15)
    for i, ci in enumerate(conv_idx):
        blk: Dict[str, Any] = {"conv": _conv(sd, f"{key}.model.{ci}")}
        if i < len(norm_idx):
            blk["norm"] = instancenorm_params(sd, f"{key}.model.{norm_idx[i]}")
        out[f"block{i}"] = blk
    out["proj"] = _conv(sd, f"{key}.model.20")
    return out


def _lsc(sd: Mapping[str, Any], key: str) -> Dict[str, Any]:
    """Reference `Lens_Shading_Correction` (LiteISP.py:363-378): convs at
    model.{0,2,4,6}."""
    return {f"conv{i}": _conv(sd, f"{key}.model.{2 * i}") for i in range(4)}


def convert_liteisp_state_dict(
    sd: Mapping[str, Any],
    use_gfm: bool = True,
    use_lsc: bool = True,
    n_blocks: int = 4,
    modulation_blocks: int = 1,
) -> Dict[str, Any]:
    """Reference `LiteISPNet*` torch state dict -> flax params for our
    `LiteISPNet` module (realcamnet_tpu.models.liteisp).

    Layer map (reference `LiteISP.py:1924-2035` for the flagship):
      head.0 -> head;  lsc -> lsc;  classifier -> classifier;
      encoder_modulation{k}.{i} -> mod{k}_{i};
      down1.{0,1,2} -> down1_conv0/_rcag/_conv1 (down1 has an extra conv
      before its DWT); down{2,3}.{0,1} -> down{2,3}_conv0/_rcag;
      middle.{0..3} -> mid_conv0/mid_rcag0/mid_rcag1/mid_conv1;
      up{3,2,1}.{1,2} -> up{k}_rcag/_conv (index 0 is the frozen DWTInverse);
      tail.{0,2} -> tail_conv0/tail_conv1. Frozen Haar DWT conv weights in the
      state dict are dropped: our DWT is a fixed orthogonal transform.
    """
    p: Dict[str, Any] = {}
    # `N.seq` unwraps single-module sequences (`networks.py:117-121`), so
    # `head = N.seq(N.conv(...))` is a bare Conv2d with no `.0` index.
    p["head"] = _conv(sd, "head" if "head.weight" in sd else "head.0")
    if use_lsc:
        p["lsc"] = _lsc(sd, "lsc")
    if use_gfm:
        p["classifier"] = _color_condition_gfm(sd, "classifier")
        for k in range(1, 5):
            for i in range(modulation_blocks):
                key = f"encoder_modulation{k}.{i}"
                if f"{key}.conv0.weight" not in sd:  # single-block seq unwrap
                    key = f"encoder_modulation{k}"
                p[f"mod{k}_{i}"] = _res_gfm(sd, key)

    p["down1_conv0"] = _conv(sd, "down1.0")
    p["down1_rcag"] = _rcagroup(sd, "down1.1", n_blocks)
    p["down1_conv1"] = _conv(sd, "down1.2")
    p["down2_conv0"] = _conv(sd, "down2.0")
    p["down2_rcag"] = _rcagroup(sd, "down2.1", n_blocks)
    p["down3_conv0"] = _conv(sd, "down3.0")
    p["down3_rcag"] = _rcagroup(sd, "down3.1", n_blocks)

    p["mid_conv0"] = _conv(sd, "middle.0")
    p["mid_rcag0"] = _rcagroup(sd, "middle.1", n_blocks)
    p["mid_rcag1"] = _rcagroup(sd, "middle.2", n_blocks)
    p["mid_conv1"] = _conv(sd, "middle.3")

    for k in (3, 2, 1):
        p[f"up{k}_rcag"] = _rcagroup(sd, f"up{k}.1", n_blocks)
        p[f"up{k}_conv"] = _conv(sd, f"up{k}.2")

    p["tail_conv0"] = _conv(sd, "tail.0")
    p["tail_conv1"] = _conv(sd, "tail.2")
    return {"params": p}


def load_liteisp_torch_checkpoint(path: str, **kw) -> Dict[str, Any]:
    """Load a torch .pth checkpoint file from disk and convert.

    Accepts either a bare state dict or the common `{'state_dict': ...}` /
    `{'params': ...}` wrappers, with or without `module.` (DataParallel,
    `networks.py:103`) prefixes.
    """
    import torch  # local import: torch is only needed for .pth deserialization

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "params", "net", "model"):
        if isinstance(obj, dict) and wrapper in obj and isinstance(obj[wrapper], dict):
            obj = obj[wrapper]
            break
    sd = {k.removeprefix("module."): v for k, v in obj.items()}
    return convert_liteisp_state_dict(sd, **kw)
