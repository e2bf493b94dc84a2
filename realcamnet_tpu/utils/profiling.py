"""FLOPs / parameter counting — the framework's replacement for the
reference's thop/fvcore harnesses (`LiteISP.py:2656-2676`, `groupmix.py:446`).

Uses XLA's own cost analysis on the lowered computation, so the numbers
reflect what actually runs (post-fusion) rather than a per-module estimate.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """FLOPs / bytes accessed of `fn(*args)` per XLA (compiled, this backend)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    return {
        "flops": float(costs.get("flops", -1)),
        "bytes_accessed": float(costs.get("bytes accessed", -1)),
        "transcendentals": float(costs.get("transcendentals", 0)),
    }


def profile_model(model, *example_inputs, method=None) -> Dict[str, float]:
    """Params + forward FLOPs for a flax model on example inputs."""
    params = jax.eval_shape(lambda: model.init(jax.random.key(0), *example_inputs))
    params = jax.tree.map(lambda s: jax.numpy.zeros(s.shape, s.dtype), params)

    def fwd(p, *xs):
        if method is not None:
            return model.apply(p, *xs, method=method)
        return model.apply(p, *xs)

    out = cost_analysis(fwd, params, *example_inputs)
    out["params"] = count_params(params)
    return out
