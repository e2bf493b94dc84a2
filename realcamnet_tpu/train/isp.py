"""ISP training: loss, train state, sharded train step.

The reference ships no training loop (SURVEY.md §0); loss convention for the
ISP stage is pixel reconstruction (L1/L2) against the DSLR sRGB ground truth.
The step is a single pjit-compiled function: batch sharded over the mesh
'data' axis, params replicated — XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def isp_loss(pred, target, loss_type: str = "l1"):
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if loss_type == "l1":
        return jnp.mean(jnp.abs(pred - target))
    if loss_type == "l2":
        return jnp.mean((pred - target) ** 2)
    raise NotImplementedError(loss_type)


def make_isp_train_step(model, loss_type: str = "l1",
                        mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted train_step(state, batch, rng) -> (state, metrics).

    batch = dict(raw, cond, coord, target) NHWC. With a mesh, batch arrays are
    expected sharded over 'data'; grads/params stay replicated.
    """

    def step_fn(state: TrainState, batch, rng):
        def loss_fn(params):
            out = model.apply(params, batch["raw"], batch["cond"],
                              batch["coord"], train=True,
                              rngs={"dropout": rng})
            loss = isp_loss(out, batch["target"], loss_type)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        mse = jnp.mean((out.astype(jnp.float32) - batch["target"].astype(jnp.float32)) ** 2)
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
        return new_state, {"loss": loss, "psnr": psnr}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, {k: data for k in ("raw", "cond", "coord", "target")}, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
