"""CBAM: convolutional block attention module (channel + spatial gates).

The reference imports `from .cbam import CBAM` (`LiteISP.py:3`) but never
ships the module (SURVEY.md §0.1) — it is only used by the 'cbam' branch of
`SpatialFeatureTransform` (`LiteISP.py:576-586`). Implemented here per the
original paper (Woo et al., ECCV'18) so that branch is functional.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.ops.blocks import Conv2d

Dtype = Any


class ChannelGate(nn.Module):
    channels: int
    reduction: int = 16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = max(1, self.channels // self.reduction)
        mlp = nn.Sequential([
            nn.Dense(hidden, param_dtype=self.param_dtype, name="fc0"),
            jax.nn.relu,
            nn.Dense(self.channels, param_dtype=self.param_dtype, name="fc1"),
        ])
        avg = mlp(jnp.mean(x, axis=(1, 2)))
        mx = mlp(jnp.max(x, axis=(1, 2)))
        gate = jax.nn.sigmoid(avg + mx)[:, None, None, :]
        return x * gate


class SpatialGate(nn.Module):
    kernel_size: int = 7
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pooled = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True),
             jnp.mean(x, axis=-1, keepdims=True)], axis=-1)
        gate = Conv2d(1, self.kernel_size, 1, self.kernel_size // 2,
                      param_dtype=self.param_dtype, name="conv")(pooled)
        return x * jax.nn.sigmoid(gate)


class CBAM(nn.Module):
    channels: int
    reduction: int = 16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelGate(self.channels, self.reduction, self.param_dtype,
                        name="channel")(x)
        return SpatialGate(param_dtype=self.param_dtype, name="spatial")(x)
