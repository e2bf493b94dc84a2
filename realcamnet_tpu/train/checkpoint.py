"""Orbax checkpointing of params + optimizer state + step.

The reference's only checkpoint machinery is CDF-buffer resizing on
state-dict load (`tcm.py:39-128`); here the entropy-coder tables are
rebuilt from params after restore (ChARMCodec.update()), so only the pytree
needs persisting.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    ckpt_dir = os.path.abspath(ckpt_dir)
    step = int(step if step is not None else jax.device_get(state.step))
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                      "step": jax.device_get(state.step)}, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def restore_params(path: str, params):
    """Restore only the params pytree (eval/codec don't need opt state, and
    this stays valid across optimizer-config changes)."""
    try:
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(path)
    except ValueError:
        # Cross-device restore (e.g. a chip-saved checkpoint opened on CPU):
        # the stored sharding can't be materialized here — restore as host
        # numpy instead and let first use device-put the leaves.
        import numpy as np

        with ocp.PyTreeCheckpointer() as ckptr:
            meta = ckptr.metadata(path).item_metadata
            tree = meta.tree if hasattr(meta, "tree") else meta
            ra = jax.tree.map(
                lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
            restored = ckptr.restore(path, restore_args=ra)
    return jax.tree.map(lambda ref, got: got, params, restored["params"])


def restore_checkpoint(path: str, state):
    """Restore into the structure of `state` (same model/optimizer)."""
    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": jax.device_get(state.step)}
    restored = ckptr.restore(path, target)
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=jax.numpy.asarray(restored["step"]))
