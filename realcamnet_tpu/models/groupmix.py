"""GroupMixFormer backbone (reference `models/groupmix.py:330-436`).

4-stage GMA transformer: conv stem (/4), per-stage separable-conv patch
embed (/2), serial GMA blocks, classifier head or intermediate feature maps
(`return_interm_layers`) for dense tasks.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.ops.attention.gma import (
    BatchNormAct,
    GMABlock,
    SeparableConv,
)
from realcamnet_tpu.ops.blocks import Conv2d

Dtype = Any


class ConvStem(nn.Module):
    """Two stride-2 convs (/4), BN+hardswish (`groupmix.py:220-237`)."""

    embedding_dim: int = 64
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.embedding_dim // 2
        x = Conv2d(mid, 3, 2, 1, param_dtype=self.param_dtype, name="proj1")(x)
        x = BatchNormAct(param_dtype=self.param_dtype, name="bn1")(x, train=train)
        x = Conv2d(self.embedding_dim, 3, 2, 1, param_dtype=self.param_dtype,
                   name="proj2")(x)
        return BatchNormAct(param_dtype=self.param_dtype, name="bn2")(x, train=train)


class PatchEmbedLayer(nn.Module):
    """Separable-conv patch embed (`groupmix.py:252-271`); stride 1 for the
    first stage, 2 otherwise."""

    embedding_dim: int
    patch_size: int = 2
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SeparableConv(self.embedding_dim, 3, self.patch_size, 1,
                          self.param_dtype, name="proj")(x)
        return BatchNormAct(param_dtype=self.param_dtype, name="bn")(x, train=train)


class GroupMixFormer(nn.Module):
    """4-stage GMA backbone + classifier (`groupmix.py:330-436`)."""

    embedding_dims: Sequence[int] = (80, 160, 320, 320)
    serial_depths: Sequence[int] = (2, 4, 12, 4)
    num_heads: int = 8
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    num_classes: int = 1000
    drop_path_rate: float = 0.2
    return_interm_layers: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pd = self.param_dtype
        total = sum(self.serial_depths)
        dpr = [self.drop_path_rate * i / max(1, total - 1) for i in range(total)]
        x = ConvStem(self.embedding_dims[0], pd, name="conv_stem")(x, train=train)
        out: List[jnp.ndarray] = []
        k = 0
        for s in range(len(self.serial_depths)):
            x = PatchEmbedLayer(
                self.embedding_dims[s],
                patch_size=1 if s == 0 else 2,
                param_dtype=pd, name=f"patch_embed{s}")(x, train=train)
            for d in range(self.serial_depths[s]):
                x = GMABlock(self.embedding_dims[s], self.num_heads,
                             float(self.mlp_ratios[s]), dpr[k], ln_eps=1e-6,
                             param_dtype=pd,
                             name=f"stage{s}_block{d}")(x, train=train)
                k += 1
            out.append(x)
        if self.return_interm_layers:
            return out
        h = BatchNormAct(use_act=False, param_dtype=pd, name="norm4")(out[-1], train=train)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.num_classes, param_dtype=pd, dtype=h.dtype,
                        name="head")(h)


def groupmixformer_tiny(**kw):
    return GroupMixFormer(embedding_dims=(80, 160, 320, 320),
                          serial_depths=(2, 4, 12, 4), **kw)
