"""Backbone classification training (GroupMixFormer, reference
`groupmix.py:330-436`).

The reference ships the backbone with an ImageNet classifier head but no
training loop; this supplies the missing L6 piece so `rcn train --model
groupmixformer` actually trains it. Cross-entropy over integer labels,
BatchNorm running stats threaded as a separate (non-differentiated)
collection. Under a mesh the batch is sharded over 'data' while params stay
replicated; jit computes batch-norm statistics over the *global* batch (the
SyncBatchNorm semantics the reference gets from `nn.SyncBatchNorm`,
`groupmix.py:64-77`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ClsTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params), tx=tx)


def synthetic_cls_batch(seed: int, batch: int, size: int = 224,
                        num_classes: int = 10) -> Dict[str, np.ndarray]:
    """Labeled synthetic images: class k tints the image toward a fixed hue
    and rotates a quadrant pattern, so a working model separates classes."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, size=batch)
    imgs = np.zeros((batch, size, size, 3), np.float32)
    hues = np.linspace(0.0, 1.0, num_classes, endpoint=False)
    for i, lab in enumerate(labels):
        base = rng.rand(size // 8, size // 8, 3).astype(np.float32)
        up = np.kron(base, np.ones((8, 8, 1), np.float32))[:size, :size]
        tint = np.array([hues[lab], 1.0 - hues[lab], 0.5], np.float32)
        q = size // 2
        quad = np.zeros((size, size, 1), np.float32)
        quad[:q, :q] = (lab % 4 == 0)
        quad[:q, q:] = (lab % 4 == 1)
        quad[q:, :q] = (lab % 4 == 2)
        quad[q:, q:] = (lab % 4 == 3)
        imgs[i] = np.clip(0.5 * up + 0.4 * tint + 0.3 * quad, 0, 1)
    return {"image": imgs, "label": labels.astype(np.int32)}


def make_cls_train_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """jitted train_step(state, batch, rng) -> (state, metrics);
    batch = {'image': (B,H,W,3), 'label': (B,) int32}."""

    def step_fn(state: ClsTrainState, batch, rng):
        def loss_fn(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), batch["label"]).mean()
            return loss, (logits, upd["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats, opt_state=new_opt)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return new_state, {"loss": loss, "acc": acc}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, {"image": data, "label": data}, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
