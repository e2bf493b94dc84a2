"""Dtype policy: bf16 compute / f32 params on TPU.

The entropy model's likelihood math (erfc CDFs, log-likelihoods — reference
`models/tcm.py:572-590`) must stay in float32; everything convolutional can run
bfloat16 on the MXU. Models thread a `DTypePolicy` and cast at boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Compute/param/output dtype triple, in the spirit of jmp policies."""

    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


def default_policy(bf16: bool = True) -> DTypePolicy:
    """bf16 compute on TPU; f32 params; f32 outputs (losses/likelihoods)."""
    if bf16:
        return DTypePolicy(compute_dtype=jnp.bfloat16, param_dtype=jnp.float32, output_dtype=jnp.float32)
    return DTypePolicy()
