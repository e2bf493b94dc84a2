"""Entropy models: factorized prior (EntropyBottleneck) + GaussianConditional.

TPU-native reimplementation of the CompressAI entropy models the reference
depends on (`tcm.py:1,427-428`; likelihood math re-derived by the reference at
`tcm.py:572-590`). All density math runs in float32 (erfc precision), inputs
are NHWC. Bitstream I/O lives in realcamnet_tpu/entropy/coder.py (host-side
rANS); here is only the differentiable part + CDF table construction.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from realcamnet_tpu.ops.bound import lower_bound

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
LIKELIHOOD_BOUND = 1e-9


def get_scale_table(minimum=SCALES_MIN, maximum=SCALES_MAX, levels=SCALES_LEVELS):
    """64 log-spaced scales in [0.11, 256] (`tcm.py:26-34`)."""
    return np.exp(np.linspace(math.log(minimum), math.log(maximum), levels)).astype(np.float32)


def ste_round(x):
    """Straight-through rounding: round(x) - sg(x) + x (`tcm.py:36-37`)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_ste_offset(x, offset):
    """ste_round(x - offset) + offset — the z_hat/y_hat quantizer
    (`tcm.py:443-445,473`)."""
    return ste_round(x - offset) + offset


def standardized_cumulative(x):
    """Gaussian CDF via 0.5*erfc(-x/sqrt(2)) (`tcm.py:587-590`)."""
    return 0.5 * jax.lax.erfc(-(2 ** -0.5) * x)


class EntropyBottleneck(nn.Module):
    """Fully-factorized learned prior (Balle 2018 cumulative-logistic density).

    Each channel's CDF is a small monotone MLP: K+1 layers of
    `logits = softplus(H_k) @ logits + b_k (+ tanh(a_k) * tanh(logits))`.
    `__call__` returns (x_hat, likelihoods). The `aux_loss` drives the
    quantiles to the tails; `medians()`/`pmf_tables()` feed compression.
    """

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        k = len(self.filters) + 1
        scale = self.init_scale ** (1.0 / k)
        c = self.channels
        matrices, biases, factors = [], [], []
        for i in range(k):
            init_v = math.log(math.expm1(1.0 / scale / dims[i + 1]))
            matrices.append(self.param(
                f"matrix{i}",
                lambda key, s=init_v, sh=(c, dims[i + 1], dims[i]): jnp.full(sh, s, jnp.float32),
            ))
            biases.append(self.param(
                f"bias{i}",
                lambda key, sh=(c, dims[i + 1], 1): jax.random.uniform(key, sh, jnp.float32, -0.5, 0.5),
            ))
            if i < k - 1:
                factors.append(self.param(
                    f"factor{i}",
                    lambda key, sh=(c, dims[i + 1], 1): jnp.zeros(sh, jnp.float32),
                ))
        self._matrices = matrices
        self._biases = biases
        self._factors = factors
        self.quantiles = self.param(
            "quantiles",
            lambda key: jnp.tile(
                jnp.array([[-self.init_scale, 0.0, self.init_scale]], jnp.float32),
                (c, 1, 1),
            ).reshape(c, 1, 3),
        )

    def _logits_cumulative(self, inputs, stop_gradient: bool):
        """inputs: (C, 1, N) -> logits (C, 1, N)."""
        logits = inputs
        for i in range(len(self.filters) + 1):
            m = self._matrices[i]
            b = self._biases[i]
            if stop_gradient:
                m = jax.lax.stop_gradient(m)
                b = jax.lax.stop_gradient(b)
            logits = jnp.einsum("cij,cjn->cin", jax.nn.softplus(m), logits) + b
            if i < len(self.filters):
                f = self._factors[i]
                if stop_gradient:
                    f = jax.lax.stop_gradient(f)
                logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def medians(self):
        return self.quantiles[:, 0, 1]

    def _likelihood(self, values):
        """values: (C, 1, N) centered latents -> likelihood of the unit bin."""
        lower = self._logits_cumulative(values - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(values + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C). Returns (x_hat, likelihoods), both x-shaped.

        Training quantization = additive U(-0.5, 0.5) noise (CompressAI
        convention); eval = hard round to medians.
        """
        b, h, w, c = x.shape
        xf = x.astype(jnp.float32)
        v = xf.transpose(3, 0, 1, 2).reshape(c, 1, -1)
        medians = jax.lax.stop_gradient(self.medians())[:, None, None]
        if train:
            noise = jax.random.uniform(self.make_rng("noise"), v.shape,
                                       jnp.float32, -0.5, 0.5)
            v_hat = v + noise
        else:
            v_hat = jnp.round(v - medians) + medians
        lik = self._likelihood(v_hat)
        lik = lower_bound(lik, LIKELIHOOD_BOUND)
        x_hat = v_hat.reshape(c, b, h, w).transpose(1, 2, 3, 0).astype(x.dtype)
        likelihoods = lik.reshape(c, b, h, w).transpose(1, 2, 3, 0)
        return x_hat, likelihoods

    def aux_loss(self):
        """Drives quantiles to (tail, median, 1-tail): sum |logits - target|.

        Must be optimized alongside the RD loss (CompressAI CompressionModel
        convention, SURVEY.md §2.6).
        """
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2.0 / self.tail_mass - 1.0)
        target = jnp.array([-t, 0.0, t], jnp.float32)[None, None, :]
        return jnp.sum(jnp.abs(logits - target))

    def pmf_params(self, max_length: int = 4096):
        """Host-side table data: (pmf, tail_mass, offsets, pmf_lengths).

        pmf: (C, L) likelihood of each integer symbol around the median;
        computed inside jit then pulled to host by the coder's update().
        """
        q = self.quantiles
        medians = q[:, 0, 1]
        minima = jnp.ceil(medians - q[:, 0, 0]).astype(jnp.int32)
        maxima = jnp.ceil(q[:, 0, 2] - medians).astype(jnp.int32)
        # Cap so pmf_length = minima + maxima + 1 <= max_length (the static
        # pmf row width below): max_length//2 each allowed 257 > 256 and
        # silently truncated the pmf row for very wide (untrained) quantiles.
        minima = jnp.clip(minima, 0, (max_length - 1) // 2)
        maxima = jnp.clip(maxima, 0, (max_length - 1) // 2)
        pmf_length = minima + maxima + 1
        L = max_length
        samples = jnp.arange(L, dtype=jnp.float32)[None, :] - minima[:, None].astype(jnp.float32)
        samples = samples + medians[:, None]
        v = samples[:, None, :]  # (C, 1, L)
        lower = self._logits_cumulative(v - 0.5, stop_gradient=True)
        upper = self._logits_cumulative(v + 0.5, stop_gradient=True)
        sign = -jnp.sign(lower + upper)
        pmf = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        pmf = pmf[:, 0, :]
        # Tail mass, CompressAI-exact: lower tail at each channel's first
        # sample, upper tail at the SHARED last sample index
        # max(pmf_length) - 1 (compressai EntropyBottleneck.update sizes its
        # grid by pmf_length.max() and reads `upper[:, 0, -1:]`). Matching
        # this keeps quantized CDF tables — and therefore bitstreams —
        # byte-identical to CompressAI for imported checkpoints.
        last = jnp.clip(jnp.max(pmf_length) - 1, 0, L - 1)
        upper_last = jnp.take(upper[:, 0, :], last, axis=1)
        tail = jax.nn.sigmoid(lower[:, 0, 0]) + jax.nn.sigmoid(-upper_last)
        return pmf, tail, -minima, pmf_length


class GaussianConditional(nn.Module):
    """Conditional Gaussian entropy model with a quantized scale table.

    Likelihood: Phi((.5-|v|)/s) - Phi((-.5-|v|)/s) with s floored at 0.11
    (`tcm.py:572-590`). `__call__` -> (values_hat, likelihoods).
    """

    scale_bound: float = SCALES_MIN
    tail_mass: float = 1e-9

    def _likelihood(self, values, scales, means=None):
        if means is not None:
            values = values - means
        scales = lower_bound(scales.astype(jnp.float32), self.scale_bound)
        values = jnp.abs(values.astype(jnp.float32))
        upper = standardized_cumulative((0.5 - values) / scales)
        lower = standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    @nn.compact
    def __call__(self, values, scales, means=None, train: bool = False):
        vf = values.astype(jnp.float32)
        if train:
            noise = jax.random.uniform(self.make_rng("noise"), vf.shape,
                                       jnp.float32, -0.5, 0.5)
            v_hat = vf + noise
        else:
            if means is not None:
                v_hat = jnp.round(vf - means.astype(jnp.float32)) + means.astype(jnp.float32)
            else:
                v_hat = jnp.round(vf)
        lik = self._likelihood(v_hat, scales, means)
        lik = lower_bound(lik, LIKELIHOOD_BOUND)
        return v_hat.astype(values.dtype), lik


def build_indexes(scales: jnp.ndarray, scale_table: np.ndarray,
                  scale_bound: float = SCALES_MIN) -> jnp.ndarray:
    """Map each scale to its quantized scale-table index (CompressAI
    `build_indexes` semantics, used at `tcm.py:549,621`).

    The scale is rounded to bf16 BEFORE the threshold comparison: the
    encoder's and decoder's scales come from separately-compiled XLA
    programs whose f32 results can differ in the last ulps (fusion-level
    reassociation survives even pinned-matmul-precision subgraphs), and a
    single index flip desyncs the rANS stream. bf16 rounding makes the two
    programs agree unless an ulp difference straddles a bf16 rounding
    midpoint (~2^-16 of the residual cases; measured: the last remaining
    slice-4 index flip at 4K, artifacts/wrans_idx_diag_r05.json). Both
    sides apply the same rounding, so the choice stays self-consistent and
    the rate impact is nil (the table has 64 log-spaced levels; bf16
    resolution is ~2^-8 relative)."""
    s = jnp.maximum(scales, scale_bound)
    s = s.astype(jnp.bfloat16).astype(jnp.float32)
    table = jnp.asarray(scale_table[:-1])
    return jnp.sum(s[..., None] > table, axis=-1).astype(jnp.int32)
