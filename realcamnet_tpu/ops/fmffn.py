"""FMFFN: frequency-modulated feed-forward network over windowed rFFT.

The reference sketches this at `raw2bit.py:58-94` but the code is dead and
half-finished (missing super().__init__, block_partitioning=None —
SURVEY.md §0.1). This is the completed design: partition the feature map
into windows, rFFT each window, scale each frequency bin by a learned weight,
inverse-FFT, plus a standard pointwise MLP. XLA lowers the FFTs natively.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FMFFN(nn.Module):
    dim: int
    window: int = 8
    mlp_ratio: float = 4.0
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.window
        pad_h = (p - h % p) % p
        pad_w = (p - w % p) % p
        if pad_h or pad_w:
            x_p = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        else:
            x_p = x
        hp, wp = h + pad_h, w + pad_w
        # Windows: (B, nh, nw, p, p, C)
        xw = x_p.reshape(b, hp // p, p, wp // p, p, c).transpose(0, 1, 3, 2, 4, 5)
        fx = jnp.fft.rfft2(xw.astype(jnp.float32), axes=(3, 4))
        weight = self.param(
            "freq_weight", nn.initializers.ones,
            (p, p // 2 + 1, c), self.param_dtype)
        fx = fx * weight[None, None, None]
        xf = jnp.fft.irfft2(fx, s=(p, p), axes=(3, 4)).astype(x.dtype)
        xf = xf.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        xf = xf[:, :h, :w]

        hdn = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hdn, param_dtype=self.param_dtype, dtype=x.dtype,
                     name="fc0")(xf)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, param_dtype=self.param_dtype, dtype=x.dtype,
                     name="fc1")(y)
        return y
