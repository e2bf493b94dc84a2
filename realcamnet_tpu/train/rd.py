"""Rate-distortion training for the joint compression models.

Loss convention (CompressAI, SURVEY.md §3.2): R = sum(-log2 p) / num_pixels,
D = MSE(x_hat, sRGB gt), L = R + lambda * 255^2 * D, plus the
entropy-bottleneck aux quantile loss optimized by a separate optimizer over
only the `quantiles` parameters (CompressAI's net/aux optimizer split).

The train step is one pjit program: batch sharded over the mesh 'data' axis,
params replicated, gradient psum inserted by XLA over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from realcamnet_tpu.train.isp import TrainState


def rd_metrics(out: Dict, target, lmbda: float) -> Dict[str, jnp.ndarray]:
    x_hat = out["x_hat"].astype(jnp.float32)
    target = target.astype(jnp.float32)
    num_px = target.shape[0] * target.shape[1] * target.shape[2]
    bpp_y = -jnp.sum(jnp.log2(out["likelihoods"]["y"])) / num_px
    bpp_z = -jnp.sum(jnp.log2(out["likelihoods"]["z"])) / num_px
    mse = jnp.mean((x_hat - target) ** 2)
    psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
    loss = bpp_y + bpp_z + lmbda * (255.0 ** 2) * mse
    return {"loss": loss, "bpp": bpp_y + bpp_z, "bpp_y": bpp_y, "bpp_z": bpp_z,
            "mse": mse, "psnr": psnr}


def _is_quantile(path) -> bool:
    return any("quantiles" in str(p) for p in path)


def make_rd_optimizer(lr: float = 1e-4, aux_lr: float = 1e-3,
                      clip_norm: Optional[float] = 1.0,
                      schedule=None) -> optax.GradientTransformation:
    """Main Adam on everything except quantiles; aux Adam on quantiles.

    Mirrors CompressAI's configure_optimizers net/aux split.
    """
    main = optax.chain(
        optax.clip_by_global_norm(clip_norm) if clip_norm else optax.identity(),
        optax.adam(schedule if schedule is not None else lr),
    )
    aux = optax.adam(aux_lr)

    def label_fn(params):
        flat = traverse_util.flatten_dict(params)
        labels = {k: ("aux" if _is_quantile(k) else "main") for k in flat}
        return traverse_util.unflatten_dict(labels)

    return optax.multi_transform({"main": main, "aux": aux}, label_fn)


def _make_step_fn(model, lmbda: float, inputs=("raw", "cond", "coord")):
    def step_fn(state: TrainState, batch, rng):
        noise_rng, drop_rng = jax.random.split(rng)

        def loss_fn(params):
            out = model.apply(params, *[batch[k] for k in inputs], train=True,
                              rngs={"noise": noise_rng, "dropout": drop_rng})
            m = rd_metrics(out, batch["target"], lmbda)
            aux = model.apply(params, method="aux_loss")
            total = m["loss"] + aux
            m = dict(m, aux_loss=aux)
            return total, m

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    return step_fn


def make_rd_train_step(model, lmbda: float, mesh: Optional[Mesh] = None,
                       inputs=("raw", "cond", "coord")) -> Callable:
    """jitted train_step(state, batch, rng) -> (state, metrics).

    batch keys: `inputs`... + 'target'. The aux quantile loss is added to the
    total so the 'aux'-labeled optimizer sees its gradient; main params get
    only the RD gradient (quantile loss depends only on quantiles; RD loss
    treats medians as stop-gradient, matching CompressAI).
    """
    step_fn = _make_step_fn(model, lmbda, inputs)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    keys = tuple(inputs) + ("target",)
    return jax.jit(
        step_fn,
        in_shardings=(repl, {k: data for k in keys}, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_rd_train_chunk(model, lmbda: float, batch_size: int, patch: int,
                        chunk: int, mesh: Optional[Mesh] = None,
                        inputs=("raw", "cond", "coord"),
                        data: str = "synthetic") -> Callable:
    """jitted chunk_fn(state, key) -> (state, stacked metrics (chunk,)).

    Runs `chunk` RD training steps in ONE device program via `lax.scan`,
    drawing each batch on device from `synthetic_batch_jax`. This removes
    the per-step host round trip (batch upload + dispatch), which dominates
    wall time on remote-dispatch backends (~2.3 s/step host-driven at r2 vs
    the ~100 ms/step of actual compute). Used by `rcn train --device-loop`
    and the RD sweep.

    `lmbda` is passed into the compiled program as a runtime scalar, so the
    four sweep legs produce IDENTICAL HLO — one compile (or persistent-cache
    hit) covers the whole lambda sweep.
    """
    from realcamnet_tpu.data.dataset import (camera_batch_jax,
                                             synthetic_batch_jax)

    batch_fn = {"synthetic": synthetic_batch_jax,
                "camera": camera_batch_jax}[data]

    def chunk_fn(state: TrainState, key, lmbda_s):
        step_fn = _make_step_fn(model, lmbda_s, inputs)

        def body(carry, _):
            st, k = carry
            k, kb, kd = jax.random.split(k, 3)
            batch = batch_fn(kb, batch_size, patch)
            st, metrics = step_fn(st, batch, kd)
            return (st, k), metrics

        (state, _), ms = jax.lax.scan(body, (state, key), None, length=chunk)
        return state, ms

    if mesh is None:
        jitted = jax.jit(chunk_fn, donate_argnums=(0,))
    else:
        repl = NamedSharding(mesh, P())
        jitted = jax.jit(chunk_fn, in_shardings=(repl, repl, repl),
                         out_shardings=(repl, repl), donate_argnums=(0,))
    lm = jnp.float32(lmbda)
    return lambda state, key, lmbda_s=None: jitted(
        state, key, lm if lmbda_s is None else lmbda_s)


def refit_quantiles(model, params, steps: int = 8000, lr: float = 5e-2):
    """Post-hoc convergence of the entropy-bottleneck aux quantile loss.

    The aux loss (reference contract: CompressAI `CompressionModel.aux_loss`,
    used by every raw2bit class via `tcm.py:320`) is a function of ONLY the
    factorized-density parameters and the `quantiles` — no data enters it.
    After RD training, the density is frozen from the main loss's point of
    view, so the quantiles can be driven the rest of the way to the tails
    with a cheap data-free Adam loop: one tiny on-device `lax.scan` instead
    of thousands of extra full train steps. Returns (new_params, aux_curve)
    where aux_curve is the (steps,) aux-loss trajectory.
    """
    def loss_fn(p):
        return model.apply(p, method="aux_loss")

    flat = traverse_util.flatten_dict(params)
    mask = traverse_util.unflatten_dict(
        {k: _is_quantile(k) for k in flat})
    tx = optax.masked(optax.adam(lr), mask)

    def step(carry, _):
        p, opt = carry
        aux, g = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(g, opt, p)
        return (optax.apply_updates(p, updates), opt), aux

    @jax.jit
    def run(p):
        (p, _), auxes = jax.lax.scan(step, (p, tx.init(p)), None,
                                     length=steps)
        return p, auxes

    return run(params)
