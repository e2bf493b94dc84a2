"""Weight-init zoo (reference `networks.py:73-106` `init_weights`/`init_net`).

The reference walks module classes by name and re-initializes Conv/Linear
weights with a selectable scheme; the flax equivalent is a pytree pass over
an initialized param tree. Semantics mirrored:

  normal      N(0, gain)
  xavier      xavier-normal with gain
  kaiming     kaiming-normal (fan_in, relu; `a=0, mode='fan_in'`)
  orthogonal  orthogonal with gain
  uniform     U(-0.2, 0.2) scaled by gain (`networks.py:87-88`)

Conv/Dense kernels are re-drawn, biases zeroed; norm scales N(1, gain) with
zero bias (`networks.py:93-95`). Params whose leaf names don't look like
weights (quantiles, embeddings, relative-position tables) are left alone.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import traverse_util

_NORM_HINTS = ("norm", "bn", "ln")


def _fans(shape):
    if len(shape) == 2:  # dense (in, out)
        return shape[0], shape[1]
    # conv HWIO
    rf = 1
    for s in shape[:-2]:
        rf *= s
    return shape[-2] * rf, shape[-1] * rf


def _draw(key, shape, dtype, init_type: str, gain: float):
    fan_in, fan_out = _fans(shape)
    if init_type == "normal":
        return gain * jax.random.normal(key, shape, dtype)
    if init_type == "xavier":
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        return std * jax.random.normal(key, shape, dtype)
    if init_type == "kaiming":
        std = (2.0 / fan_in) ** 0.5
        return std * jax.random.normal(key, shape, dtype)
    if init_type == "orthogonal":
        flat = (int(jnp.prod(jnp.asarray(shape[:-1]))), shape[-1])
        q = jax.nn.initializers.orthogonal(scale=gain)(key, flat, dtype)
        return q.reshape(shape)
    if init_type == "uniform":
        return gain * jax.random.uniform(key, shape, dtype, -0.2, 0.2)
    raise ValueError(f"unknown init_type {init_type!r}")


def init_weights(params: Dict[str, Any], rng, init_type: str = "kaiming",
                 gain: float = 0.02) -> Dict[str, Any]:
    """Re-initialize an (already shaped) param tree with the chosen scheme.

    Re-draws every 'kernel' leaf with ndim >= 2, zeroes 'bias' leaves, sets
    norm-layer 'scale' to N(1, gain); leaves everything else untouched.
    """
    flat = traverse_util.flatten_dict(params)
    out = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    for k, (path, leaf) in zip(keys, sorted(flat.items())):
        name = path[-1]
        in_norm = any(h in str(p).lower() for p in path for h in _NORM_HINTS)
        if name == "kernel" and leaf.ndim >= 2 and not in_norm:
            out[path] = _draw(k, leaf.shape, leaf.dtype, init_type, gain)
        elif name == "scale" and in_norm:
            out[path] = (jnp.ones_like(leaf)
                         + gain * jax.random.normal(k, leaf.shape, leaf.dtype))
        elif name == "bias":
            out[path] = jnp.zeros_like(leaf)
        else:
            out[path] = leaf
    return traverse_util.unflatten_dict(out)
