"""PreCoord: predicts the 2-d coordinate offset of a crop from a resized raw.

Reference `LiteISP.py:130-162`: 4 stride-2 convs + FC over a 224x224-resized
packed raw -> 2 values (the crop's normalized position), used to synthesize
the coordinate map when the dataset doesn't record crop origins. (The
reference hard-loads `./ckpt/coord.pth`, which was never shipped — here it is
a trainable module.)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from realcamnet_tpu.ops.blocks import Conv2d, leaky_relu, resize_bilinear

Dtype = Any


class PreCoord(nn.Module):
    nf: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, raw):
        """raw: (B, H, W, 4) packed Bayer -> (B, 2) normalized crop offset."""
        x = resize_bilinear(raw, (224, 224), align_corners=False)
        for i, f in enumerate((self.nf, self.nf * 2, self.nf * 4, self.nf * 8)):
            x = Conv2d(f, 3, 2, 1, param_dtype=self.param_dtype,
                       name=f"conv{i}")(x)
            x = leaky_relu(x, 0.1)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(128, param_dtype=self.param_dtype, dtype=x.dtype,
                     name="fc0")(x)
        x = leaky_relu(x, 0.1)
        return nn.Dense(2, param_dtype=self.param_dtype, dtype=x.dtype,
                        name="fc1")(x)
