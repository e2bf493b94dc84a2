"""Lower-bound op with CompressAI's gradient semantics.

`lower_bound(x, b)` = max(x, b), but gradients pass through when x >= b OR
when the incoming gradient pushes x upward (grad < 0). This is the autograd
trick CompressAI's GDN/entropy models rely on to keep bounded parameters
trainable (reference stack: compressai.ops.LowerBound, used under
`tcm.py:1-11` imports).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


@jax.custom_vjp
def upper_bound(x, bound):
    return jnp.minimum(x, bound)


def _ub_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _ub_bwd(res, g):
    x, bound = res
    pass_through = (x <= bound) | (g > 0)
    return (jnp.where(pass_through, g, 0.0), None)


upper_bound.defvjp(_ub_fwd, _ub_bwd)
