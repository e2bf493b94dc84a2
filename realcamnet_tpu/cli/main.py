"""`rcn` command-line interface: train / eval-rd / compress / decompress /
bench / models (the L6 experiment harness the reference lacks, SURVEY.md §1).
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys
import time


def _models():
    from realcamnet_tpu.models.liteisp import ISP_MODELS
    from realcamnet_tpu.models.raw2bit import RAW2BIT_MODELS
    from realcamnet_tpu.models.tcm import TCM_MODELS

    return ISP_MODELS, RAW2BIT_MODELS, TCM_MODELS


# Model input convention by kind: which batch keys feed model.apply. The RD
# target is always batch["target"]; for standalone image codecs (TCM) the
# input IS the target (reference `tcm.py:642`: 3-ch image in, image out).
MODEL_INPUTS = {"raw2bit": ("raw", "cond", "coord"), "tcm": ("target",)}


def _build_model(name: str, **kw):
    isp, r2b, tcm = _models()
    if name in r2b:
        return r2b[name](**kw), "raw2bit"
    if name in tcm:
        return tcm[name](**kw), "tcm"
    if name in isp:
        return isp[name](), "isp"
    raise SystemExit(f"unknown model {name!r}; run `rcn models`")


def cmd_models(args):
    isp, r2b, tcm = _models()
    print("# Joint RAW->bitstream models (raw2bit):")
    for k in sorted(r2b):
        print(" ", k)
    print("# Standalone image codecs (3-ch input):")
    for k in sorted(tcm):
        print(" ", k)
    print("# ISP models (RAW->sRGB):")
    for k in sorted(isp):
        print(" ", k)


def _train_groupmix(args):
    """Backbone classification training (`rcn train --model groupmixformer`):
    GroupMixFormer + cross-entropy on synthetic labeled images."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from realcamnet_tpu.models.groupmix import groupmixformer_tiny
    from realcamnet_tpu.parallel.mesh import create_mesh, shard_batch
    from realcamnet_tpu.train.classify import (
        ClsTrainState,
        make_cls_train_step,
        synthetic_cls_batch,
    )

    num_classes = 10
    model = groupmixformer_tiny(num_classes=num_classes)
    mesh = None
    if args.mesh_data:
        mesh = create_mesh(data=args.mesh_data, spatial=args.mesh_spatial)
    size = args.patch
    example = synthetic_cls_batch(0, args.batch_size, size, num_classes)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(args.seed), jnp.asarray(example["image"]))
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    print(f"[train] groupmixformer: {n_params/1e6:.2f}M params")
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))
    state = ClsTrainState.create(variables, tx)
    step_fn = make_cls_train_step(model, mesh=mesh)
    rng = jax.random.key(args.seed + 1)
    t0 = time.time()
    curve = []
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_cls_batch(i + 1, args.batch_size, size,
                                     num_classes).items()}
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, metrics = step_fn(state, batch, sub)
        if (i + 1) % args.log_every == 0:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            curve.append({"step": i + 1, **m})
            print(f"[train] step {i+1} loss={m['loss']:.4f} acc={m['acc']:.3f}")
    return {"ckpt": "", "curve": curve, "train_s": time.time() - t0}


def cmd_train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realcamnet_tpu.data.dataset import (
        PairedRawDataset,
        prefetch_to_device,
        synthetic_batch,
    )
    from realcamnet_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from realcamnet_tpu.parallel.mesh import create_mesh, shard_batch
    from realcamnet_tpu.train.isp import TrainState, make_isp_train_step
    from realcamnet_tpu.train.rd import make_rd_optimizer, make_rd_train_step
    from realcamnet_tpu.train.schedules import make_schedule

    if args.model == "groupmixformer":
        return _train_groupmix(args)

    model, kind = _build_model(args.model)
    patch = args.patch

    mesh = None
    if args.mesh_data:
        mesh = create_mesh(data=args.mesh_data, spatial=args.mesh_spatial)
        print(f"[train] mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}"
              f" over {mesh.devices.size} devices")
        if args.batch_size % args.mesh_data:
            raise SystemExit(
                f"--batch-size {args.batch_size} not divisible by "
                f"--mesh-data {args.mesh_data}")

    def batches():
        if args.data == "synthetic":
            for step in range(args.steps):
                yield synthetic_batch(step, args.batch_size, patch)
        elif args.data == "camera":
            from realcamnet_tpu.data.dataset import camera_batch_jax

            for step in range(args.steps):
                yield {k: np.asarray(v) for k, v in camera_batch_jax(
                    jax.random.key(step), args.batch_size, patch).items()}
        else:
            ds = PairedRawDataset(args.data, patch=patch, seed=0)
            yield from ds.batches(args.batch_size, args.steps)

    first = next(batches())
    example = {k: jnp.asarray(v[:1]) for k, v in first.items()}
    in_keys = MODEL_INPUTS.get(kind, ("raw", "cond", "coord"))
    params = jax.jit(model.init)(jax.random.key(args.seed),
                                 *[example[k] for k in in_keys])
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"[train] {args.model} ({kind}): {n_params/1e6:.2f}M params")

    if args.init != "default":
        from realcamnet_tpu.ops.init import init_weights

        params = dict(params, params=init_weights(
            params["params"], jax.random.key(args.seed + 2), args.init,
            args.init_gain))
        print(f"[train] re-initialized with {args.init} (gain {args.init_gain})")

    sched = make_schedule(args.lr_policy, args.lr, niter=args.steps,
                          niter_decay=args.steps // 2,
                          lr_decay_iters=max(args.steps // 4, 1))
    if kind in ("raw2bit", "tcm"):
        tx = make_rd_optimizer(args.lr, schedule=sched)
        step_fn = make_rd_train_step(model, args.lmbda, mesh=mesh,
                                     inputs=in_keys)
    else:
        import optax

        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
        step_fn = make_isp_train_step(model, mesh=mesh)
    state = TrainState.create(params, tx)

    if args.ckpt_dir:
        latest = latest_checkpoint(args.ckpt_dir)
        if latest and args.resume:
            state = restore_checkpoint(latest, state)
            print(f"[train] resumed from {latest} @ step {int(state.step)}")

    rng = jax.random.key(args.seed + 1)
    t0 = time.time()
    curve = []
    if (args.device_loop and args.data in ("synthetic", "camera")
            and kind in ("raw2bit", "tcm")):
        # On-device scan loop: `--device-loop K` runs K steps per jit call
        # with batches drawn on device (train/rd.py make_rd_train_chunk) —
        # removes the per-step host round trip that dominates wall time on
        # remote-dispatch backends.
        from realcamnet_tpu.train.rd import make_rd_train_chunk

        chunk = args.device_loop
        chunk_fn = make_rd_train_chunk(model, args.lmbda, args.batch_size,
                                       patch, chunk, mesh=mesh,
                                       data=args.data, inputs=in_keys)
        for ci in range(-(-args.steps // chunk)):
            rng, sub = jax.random.split(rng)
            state, ms = chunk_fn(state, sub)
            m = {k: float(v[-1]) for k, v in jax.device_get(ms).items()}
            step = int(jax.device_get(state.step))
            curve.append({"step": step, **m})
            rate = step * args.batch_size / (time.time() - t0)
            msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
            print(f"[train] step {step} {msg} ({rate:.2f} img/s)", flush=True)
            # ceil division: save at most every ckpt_every steps (floor
            # division saved MORE often than requested when chunk ∤ ckpt_every)
            if args.ckpt_dir and (ci + 1) % max(-(-args.ckpt_every // chunk), 1) == 0:
                print(f"[train] saved {save_checkpoint(args.ckpt_dir, state)}")
    else:
        for i, batch in enumerate(batches()):
            rng, sub = jax.random.split(rng)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            state, metrics = step_fn(state, batch, sub)
            if (i + 1) % args.log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                curve.append({"step": int(jax.device_get(state.step)), **m})
                rate = (i + 1) * args.batch_size / (time.time() - t0)
                msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                print(f"[train] step {curve[-1]['step']} {msg} ({rate:.2f} img/s)")
            if args.ckpt_dir and (i + 1) % args.ckpt_every == 0:
                path = save_checkpoint(args.ckpt_dir, state)
                print(f"[train] saved {path}")
    path = ""
    if args.ckpt_dir:
        path = save_checkpoint(args.ckpt_dir, state)
        print(f"[train] saved {path}")
    return {"ckpt": path, "curve": curve, "train_s": time.time() - t0}


def cmd_eval_rd(args):
    import jax
    import jax.numpy as jnp

    from realcamnet_tpu.data.dataset import (
        PairedRawDataset,
        synthetic_batch,
        synthetic_eval_batches_jax,
    )
    from realcamnet_tpu.evaluation.rd import (
        eval_dataset,
        eval_real_bitstream_set,
    )
    from realcamnet_tpu.train.checkpoint import restore_params

    model, kind = _build_model(args.model)
    if kind not in ("raw2bit", "tcm"):
        raise SystemExit("eval-rd needs a raw2bit or tcm model")
    in_keys = MODEL_INPUTS[kind]

    def batches():
        if args.data == "synthetic":
            for i in range(args.num_images):
                yield {k: jnp.asarray(v) for k, v in
                       synthetic_batch(1000 + i, 1, args.patch).items()}
        elif args.data == "synthetic-jax":
            # Same distribution the --device-loop trainer draws from.
            yield from synthetic_eval_batches_jax(1000, args.num_images,
                                                  args.patch)
        elif args.data in ("camera", "camera-jax"):
            from realcamnet_tpu.data.dataset import camera_eval_batches_jax

            yield from camera_eval_batches_jax(1000, args.num_images,
                                               args.patch)
        else:
            ds = PairedRawDataset(args.data, patch=args.patch, train=False)
            for i in range(min(args.num_images, len(ds))):
                s = ds.sample(i)
                yield {k: jnp.asarray(v[None]) for k, v in s.items()}

    example = next(batches())
    params = jax.jit(model.init)(jax.random.key(0),
                                 *[example[k] for k in in_keys])
    if args.ckpt:
        params = restore_params(args.ckpt, params)

    lpips_params = None
    if args.lpips_ckpt:
        from realcamnet_tpu.evaluation.lpips import (
            init_lpips_params,
            load_torch_lpips,
        )

        if args.lpips_ckpt == "random":  # untrained net: wiring checks only
            lpips_params = init_lpips_params(jax.random.key(7),
                                             net=args.lpips_net)
        else:
            lpips_params = load_torch_lpips(args.lpips_ckpt,
                                            net=args.lpips_net)

    result = eval_dataset(model, params, batches(),
                          lpips_params=lpips_params, lpips_net=args.lpips_net,
                          inputs=in_keys)
    if args.real_bitstream:
        # Whole eval set through the real rANS coder (one codec, reused),
        # reporting the real-vs-estimated bpp gap distribution.
        result.update(eval_real_bitstream_set(model, params, batches(),
                                              inputs=in_keys))
    result = {"model": args.model, "ckpt": args.ckpt, **result}
    print(json.dumps(result))
    return result


MAGIC = b"RCN1"


def cmd_compress(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realcamnet_tpu.data.dataset import coord_map, pack_bayer_np
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.train.checkpoint import restore_params

    model, kind = _build_model(args.model)
    raw = np.load(args.input)
    if kind == "tcm":
        # Standalone image codec: input is an (H, W, 3) sRGB image in [0,1].
        assert raw.ndim == 3 and raw.shape[-1] == 3, (
            "TCM compresses 3-ch sRGB images (H, W, 3)")
        ins = [jnp.asarray(raw[None].astype(np.float32))]
        npx = raw.shape[0] * raw.shape[1]
    else:
        if raw.ndim == 2 or raw.shape[-1] == 1:
            packed = pack_bayer_np(raw)
        else:
            packed = raw
        packed = packed[None].astype(np.float32)
        coord = coord_map(packed.shape[1], packed.shape[2])[None]
        ins = [jnp.asarray(packed), jnp.asarray(packed), jnp.asarray(coord)]
        npx = packed.shape[1] * packed.shape[2] * 4
    params = jax.jit(model.init)(jax.random.key(0), *ins)
    if args.ckpt:
        params = restore_params(args.ckpt, params)
    codec = ChARMCodec(model, params)
    codec.update()
    out = codec.compress(*ins)
    y_str, z_str = out["strings"][0][0], out["strings"][1][0]
    with open(args.output, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<HHII", out["shape"][0], out["shape"][1],
                            len(y_str), len(z_str)))
        f.write(y_str)
        f.write(z_str)
    print(json.dumps({"bytes": len(y_str) + len(z_str) + 16,
                      "bpp": (len(y_str) + len(z_str)) * 8 / npx}))


def cmd_decompress(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.train.checkpoint import restore_params

    model, kind = _build_model(args.model)
    with open(args.input, "rb") as f:
        assert f.read(4) == MAGIC, "bad bitstream magic"
        hz, wz, ny, nz = struct.unpack("<HHII", f.read(12))
        y_str = f.read(ny)
        z_str = f.read(nz)
    # Params must match the encoder's checkpoint.
    hy, wy = hz * 4, wz * 4
    if kind == "tcm":
        dummy = jnp.zeros((1, hy * 16, wy * 16, 3))
        params = jax.jit(model.init)(jax.random.key(0), dummy)
    else:
        dummy = jnp.zeros((1, hy * 8, wy * 8, 4))
        coord = jnp.zeros((1, hy * 8, wy * 8, 2))
        params = jax.jit(model.init)(jax.random.key(0), dummy, dummy, coord)
    if args.ckpt:
        params = restore_params(args.ckpt, params)
    codec = ChARMCodec(model, params)
    codec.update()
    dec = codec.decompress([[y_str], [z_str]], (hz, wz))
    x = np.asarray(jax.device_get(dec["x_hat"][0]))
    np.save(args.output, x)
    print(json.dumps({"shape": list(x.shape), "output": args.output}))


def cmd_bench(args):
    import bench

    bench.main()


def cmd_profile(args):
    """FLOPs / params / bytes for any registered model (the reference's thop
    harnesses, `LiteISP.py:2659-2682`, `groupmix.py:439-457`)."""
    import jax.numpy as jnp

    from realcamnet_tpu.utils.profiling import profile_model

    isp, r2b, tcm = _models()
    s = args.size
    if args.model == "groupmixformer":
        from realcamnet_tpu.models.groupmix import groupmixformer_tiny

        model = groupmixformer_tiny()
        inputs = (jnp.ones((1, s, s, 3), jnp.float32),)
    elif args.model in tcm:
        # Reference harness: TCM(N=64) on 1x3x512x512 (`tcm.py:642-651`).
        model, _ = _build_model(args.model)
        inputs = (jnp.ones((1, s, s, 3), jnp.float32),)
    elif args.model in r2b or args.model in isp:
        model, _ = _build_model(args.model)
        inputs = (jnp.ones((1, s, s, 4), jnp.float32),
                  jnp.ones((1, s, s, 4), jnp.float32),
                  jnp.ones((1, s, s, 2), jnp.float32))
    else:
        raise SystemExit(f"unknown model {args.model!r}; run `rcn models`")
    print(json.dumps({"model": args.model, **profile_model(model, *inputs)}))


def cmd_sweep(args):
    """Train + eval one model per lambda point — the full RD-curve recipe
    (reference operating points, BASELINE.md). With --device-loop the
    training runs as on-device scan chunks (fast path through remote-dispatch
    backends); --out writes the whole sweep (curves + RD points + real-
    bitstream verification) as one JSON artifact."""
    from realcamnet_tpu.core.config import ExperimentConfig

    cfg = ExperimentConfig.load(args.config) if args.config else ExperimentConfig()
    eval_data = ("synthetic-jax" if args.device_loop and
                 cfg.data.source == "synthetic" else cfg.data.source)
    if args.device_loop and cfg.data.source in ("synthetic", "camera"):
        results = _sweep_device_loop(cfg, args.device_loop, eval_data)
    else:
        results = _sweep_via_train(cfg, args, eval_data)
    out = {"config": json.loads(cfg.to_json()), "device_loop": args.device_loop,
           "points": results}
    print(json.dumps({"sweep": [{"lmbda": r["lmbda"], **r["eval"]}
                                for r in results]}))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[sweep] wrote {args.out}")
    return out


def _sweep_device_loop(cfg, chunk, eval_data):
    """One-process sweep fast path: the scan-chunk train program takes lambda
    as a RUNTIME scalar, so all lambda legs share a single trace/compile —
    essential through remote-dispatch backends where every compile of the
    full fwd+bwd graph costs minutes and the persistent cache does not apply."""
    import jax
    import numpy as np

    from realcamnet_tpu.models.raw2bit import RAW2BIT_MODELS
    from realcamnet_tpu.data.dataset import (
        synthetic_batch_jax,
        synthetic_eval_batches_jax,
    )
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.evaluation.rd import (
        _make_eval_fn,
        eval_forward_metrics,
        eval_real_bitstream,
    )
    from realcamnet_tpu.train.checkpoint import save_checkpoint
    from realcamnet_tpu.train.isp import TrainState
    from realcamnet_tpu.train.rd import make_rd_optimizer, make_rd_train_chunk
    from realcamnet_tpu.train.schedules import make_schedule

    t = cfg.train
    if cfg.model.name in RAW2BIT_MODELS:
        model = RAW2BIT_MODELS[cfg.model.name](**cfg.model.kwargs)
        in_keys = MODEL_INPUTS["raw2bit"]
    else:
        from realcamnet_tpu.models.tcm import TCM_MODELS

        model = TCM_MODELS[cfg.model.name](**cfg.model.kwargs)
        in_keys = MODEL_INPUTS["tcm"]
    if cfg.data.source == "camera":
        from realcamnet_tpu.data.dataset import (camera_batch_jax as _bjax,
                                                 camera_eval_batches_jax
                                                 as _ebjax)
    else:
        _bjax, _ebjax = synthetic_batch_jax, synthetic_eval_batches_jax
    example = _bjax(jax.random.key(0), 1, t.patch)
    sched = make_schedule(t.lr_policy, t.lr, niter=t.steps,
                          niter_decay=t.niter_decay,
                          lr_decay_iters=t.lr_decay_iters)
    chunk_fn = make_rd_train_chunk(model, t.lmbda, t.batch_size, t.patch,
                                   chunk, data=cfg.data.source,
                                   inputs=in_keys)
    # Shared eval/codec jits across lambda legs (params are jit ARGS, so one
    # trace serves all four checkpoints).
    eval_fn = _make_eval_fn(model, inputs=in_keys)
    codec = None
    results = []
    for li, lmbda in enumerate(cfg.lambdas):
        t0 = time.time()
        params = jax.jit(model.init)(jax.random.key(t.seed + li),
                                     *[example[k] for k in in_keys])
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        print(f"[sweep] lmbda={lmbda:g}: {n_params/1e6:.2f}M params",
              flush=True)
        tx = make_rd_optimizer(t.lr, aux_lr=t.aux_lr, clip_norm=t.clip_norm,
                               schedule=sched)
        state = TrainState.create(params, tx)
        rng = jax.random.key(t.seed + 100 + li)
        curve = []
        import jax.numpy as jnp

        lm = jnp.float32(lmbda)
        for ci in range(-(-t.steps // chunk)):
            rng, sub = jax.random.split(rng)
            state, ms = chunk_fn(state, sub, lm)
            m = {k: float(v[-1]) for k, v in jax.device_get(ms).items()}
            step = int(jax.device_get(state.step))
            curve.append({"step": step, **m})
            rate = step * t.batch_size / (time.time() - t0)
            print(f"[sweep] lmbda={lmbda:g} step {step} "
                  + " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                  + f" ({rate:.2f} img/s)", flush=True)
        # Post-hoc aux-quantile convergence (data-free; see
        # train.rd.refit_quantiles) so the saved checkpoint and the
        # real-bitstream eval below carry tail-converged CDF tables.
        refit = {}
        try:
            from realcamnet_tpu.train.rd import refit_quantiles

            new_params, aux_curve = refit_quantiles(model, state.params)
            aux_curve = jax.device_get(aux_curve)
            refit = {"aux_before": float(aux_curve[0]),
                     "aux_after": float(aux_curve[-1])}
            state = state.replace(params=new_params)
            print(f"[sweep] aux refit: {refit['aux_before']:.2f} -> "
                  f"{refit['aux_after']:.2f}", flush=True)
        except Exception as e:  # keep the sweep alive on refit failure
            refit = {"error": repr(e)}
            print(f"[sweep] aux refit FAILED: {e!r}", flush=True)
        ckpt_dir = os.path.join(t.ckpt_dir, f"lmbda_{lmbda:g}")
        ckpt = save_checkpoint(ckpt_dir, state)
        print(f"[sweep] saved {ckpt}", flush=True)
        train_s = time.time() - t0

        # Eval: likelihood metrics + real-bitstream over the whole eval set.
        if codec is None:
            codec = ChARMCodec(model, state.params)
        else:
            codec.params = state.params
        codec.update()
        acc = {}
        per_img = []
        for b in _ebjax(1000, cfg.data.num_eval_images, t.patch):
            est = eval_forward_metrics(model, state.params, b, _fn=eval_fn,
                                       inputs=in_keys)
            rb = eval_real_bitstream(model, state.params, b, codec=codec,
                                     inputs=in_keys)
            rb["bpp_est"] = est["bpp"]
            rb["bpp_gap_pct"] = (100.0 * (rb["bpp_real"] - est["bpp"])
                                 / max(est["bpp"], 1e-9))
            per_img.append(rb)
            for k, v in est.items():
                acc[k] = acc.get(k, 0.0) + v / cfg.data.num_eval_images
        ev = dict(acc)
        for k in per_img[0]:
            vals = np.array([p[k] for p in per_img], np.float64)
            # Real-bitstream means override the forward-eval means for
            # shared keys (psnr, delta_e): the coded-path numbers are the
            # ones the RD table reports (matches eval_real_bitstream_set).
            ev[k] = float(vals.mean())
            if k == "bpp_gap_pct":
                ev["bpp_gap_pct_std"] = float(vals.std())
                ev["bpp_gap_pct_max"] = float(vals.max())
        ev["num_images"] = cfg.data.num_eval_images
        print(f"[sweep] lmbda={lmbda:g} eval: {json.dumps(ev)}", flush=True)
        results.append({"lmbda": lmbda, "eval": ev, "train_s": train_s,
                        "refit": refit, "curve": curve})
    return results


def _sweep_via_train(cfg, args, eval_data):
    results = []
    for lmbda in cfg.lambdas:
        ckpt_dir = os.path.join(cfg.train.ckpt_dir, f"lmbda_{lmbda:g}")
        train_args = [
            "train", "--model", cfg.model.name, "--data", cfg.data.source,
            "--steps", str(cfg.train.steps), "--batch-size",
            str(cfg.train.batch_size), "--patch", str(cfg.train.patch),
            "--lr", str(cfg.train.lr), "--lr-policy", cfg.train.lr_policy,
            "--lmbda", str(lmbda), "--ckpt-dir", ckpt_dir,
            "--ckpt-every", str(cfg.train.ckpt_every),
            "--log-every", str(cfg.train.log_every),
        ]
        if args.device_loop:
            train_args += ["--device-loop", str(args.device_loop)]
        if cfg.mesh.data:
            train_args += ["--mesh-data", str(cfg.mesh.data),
                           "--mesh-spatial", str(cfg.mesh.spatial)]
        tr = main(train_args)
        ev = main(["eval-rd", "--model", cfg.model.name, "--data", eval_data,
                   "--ckpt", tr["ckpt"], "--patch", str(cfg.train.patch),
                   "--num-images", str(cfg.data.num_eval_images),
                   "--real-bitstream"])
        results.append({"lmbda": lmbda, "eval": ev,
                        "train_s": tr["train_s"],
                        "curve": tr["curve"]})
    return results


def main(argv=None):
    p = argparse.ArgumentParser(prog="rcn", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("models").set_defaults(fn=cmd_models)

    t = sub.add_parser("train")
    t.add_argument("--model", default="raw_compression_tcm_final")
    t.add_argument("--data", default="synthetic")
    t.add_argument("--steps", type=int, default=100)
    t.add_argument("--batch-size", type=int, default=4)
    t.add_argument("--patch", type=int, default=128)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--lr-policy", default="constant")
    t.add_argument("--lmbda", type=float, default=0.01)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=10)
    t.add_argument("--ckpt-dir", default="")
    t.add_argument("--ckpt-every", type=int, default=1000)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel devices (0 = single device)")
    t.add_argument("--mesh-spatial", type=int, default=1)
    t.add_argument("--init", default="default",
                   choices=["default", "normal", "xavier", "kaiming",
                            "orthogonal", "uniform"],
                   help="weight-init zoo (reference networks.py:73-97)")
    t.add_argument("--init-gain", type=float, default=0.02)
    t.add_argument("--device-loop", type=int, default=0,
                   help="run K steps per jit call with on-device synthetic "
                        "batches (lax.scan; requires --data synthetic)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval-rd")
    e.add_argument("--model", default="raw_compression_tcm_final")
    e.add_argument("--data", default="synthetic")
    e.add_argument("--ckpt", default="")
    e.add_argument("--patch", type=int, default=128)
    e.add_argument("--num-images", type=int, default=4)
    e.add_argument("--real-bitstream", action="store_true")
    e.add_argument("--lpips-ckpt", default="",
                   help="torch LPIPS weights (.pth), or 'random' for a "
                        "randomly-initialized net (wiring check only). "
                        "Published-comparable LPIPS numbers REQUIRE the pip "
                        "`lpips` package's pretrained weights here; without "
                        "them the LPIPS column is not comparable to the "
                        "reference rdcurve.png")
    e.add_argument("--lpips-net", default="alex", choices=["alex", "vgg"])
    e.set_defaults(fn=cmd_eval_rd)

    c = sub.add_parser("compress")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("--model", default="raw_compression_tcm_final")
    c.add_argument("--ckpt", default="")
    c.set_defaults(fn=cmd_compress)

    d = sub.add_parser("decompress")
    d.add_argument("input")
    d.add_argument("output")
    d.add_argument("--model", default="raw_compression_tcm_final")
    d.add_argument("--ckpt", default="")
    d.set_defaults(fn=cmd_decompress)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)

    s = sub.add_parser("sweep")
    s.add_argument("--config", default="",
                   help="ExperimentConfig JSON; defaults cover the 4-lambda "
                        "RD curve")
    s.add_argument("--device-loop", type=int, default=0,
                   help="steps per jit call for the on-device train loop")
    s.add_argument("--out", default="", help="write sweep artifact JSON here")
    s.set_defaults(fn=cmd_sweep)

    pr = sub.add_parser("profile")
    pr.add_argument("--model", default="lite_isp_net_gfm_lsc")
    pr.add_argument("--size", type=int, default=256)
    pr.set_defaults(fn=cmd_profile)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
