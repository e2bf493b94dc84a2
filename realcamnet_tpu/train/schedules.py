"""LR policies mirroring the reference's `get_scheduler` (`networks.py:50-71`).

The reference exposes 'linear' (constant for `niter` epochs then linear decay
over `niter_decay`), 'step' (gamma=0.5 every `lr_decay_iters`), 'plateau'
(stateful, driven by eval loss — see `plateau_factor` helper), and 'cosine'
(T_max=niter, eta_min=0). Here they are optax schedules over *steps*.
"""

from __future__ import annotations

from typing import Optional

import optax


def make_schedule(
    policy: str,
    base_lr: float,
    niter: int = 100,
    niter_decay: int = 100,
    lr_decay_iters: int = 50,
) -> optax.Schedule:
    import jax.numpy as jnp

    if policy == "linear":
        def sched(step):
            frac = 1.0 - jnp.maximum(0.0, step - niter) / max(1, float(niter_decay))
            return base_lr * jnp.clip(frac, 0.0, 1.0)
        return sched
    if policy == "step":
        return optax.exponential_decay(
            base_lr, transition_steps=lr_decay_iters, decay_rate=0.5, staircase=True
        )
    if policy == "cosine":
        return optax.cosine_decay_schedule(base_lr, decay_steps=niter, alpha=0.0)
    if policy == "constant":
        return optax.constant_schedule(base_lr)
    raise NotImplementedError(f"lr policy {policy!r}")


def plateau_factor(history, factor: float = 0.2, threshold: float = 0.01,
                   patience: int = 5) -> float:
    """Host-side ReduceLROnPlateau: returns the multiplier to apply given the
    eval-loss history (mirrors `networks.py:61-66` semantics)."""
    mult = 1.0
    best = float("inf")
    bad = 0
    for v in history:
        if v < best * (1.0 - threshold):
            best = v
            bad = 0
        else:
            bad += 1
            if bad > patience:
                mult *= factor
                bad = 0
    return mult
