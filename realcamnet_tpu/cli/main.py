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

    return ISP_MODELS, RAW2BIT_MODELS


def _build_model(name: str, **kw):
    isp, r2b = _models()
    if name in r2b:
        return r2b[name](**kw), "raw2bit"
    if name in isp:
        return isp[name](), "isp"
    raise SystemExit(f"unknown model {name!r}; run `rcn models`")


def cmd_models(args):
    isp, r2b = _models()
    print("# Joint RAW->bitstream models (raw2bit):")
    for k in sorted(r2b):
        print(" ", k)
    print("# ISP models (RAW->sRGB):")
    for k in sorted(isp):
        print(" ", k)


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
        else:
            ds = PairedRawDataset(args.data, patch=patch, seed=0)
            yield from ds.batches(args.batch_size, args.steps)

    first = next(batches())
    example = {k: jnp.asarray(v[:1]) for k, v in first.items()}
    params = jax.jit(model.init)(jax.random.key(args.seed), example["raw"],
                                 example["cond"], example["coord"])
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
    if kind == "raw2bit":
        tx = make_rd_optimizer(args.lr, schedule=sched)
        step_fn = make_rd_train_step(model, args.lmbda, mesh=mesh)
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
    for i, batch in enumerate(batches()):
        rng, sub = jax.random.split(rng)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, metrics = step_fn(state, batch, sub)
        if (i + 1) % args.log_every == 0:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            rate = (i + 1) * args.batch_size / (time.time() - t0)
            msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
            print(f"[train] step {int(state.step)} {msg} ({rate:.2f} img/s)")
        if args.ckpt_dir and (i + 1) % args.ckpt_every == 0:
            path = save_checkpoint(args.ckpt_dir, state)
            print(f"[train] saved {path}")
    if args.ckpt_dir:
        path = save_checkpoint(args.ckpt_dir, state)
        print(f"[train] saved {path}")


def cmd_eval_rd(args):
    import jax
    import jax.numpy as jnp

    from realcamnet_tpu.data.dataset import PairedRawDataset, synthetic_batch
    from realcamnet_tpu.evaluation.rd import (
        eval_dataset,
        eval_real_bitstream,
    )
    from realcamnet_tpu.train.checkpoint import restore_params

    model, kind = _build_model(args.model)
    if kind != "raw2bit":
        raise SystemExit("eval-rd needs a raw2bit model")

    def batches():
        if args.data == "synthetic":
            for i in range(args.num_images):
                yield {k: jnp.asarray(v) for k, v in
                       synthetic_batch(1000 + i, 1, args.patch).items()}
        else:
            ds = PairedRawDataset(args.data, patch=args.patch, train=False)
            for i in range(min(args.num_images, len(ds))):
                s = ds.sample(i)
                yield {k: jnp.asarray(v[None]) for k, v in s.items()}

    example = next(batches())
    params = jax.jit(model.init)(jax.random.key(0), example["raw"],
                                 example["cond"], example["coord"])
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
                          lpips_params=lpips_params, lpips_net=args.lpips_net)
    if args.real_bitstream:
        result.update(eval_real_bitstream(model, params, example))
    print(json.dumps({"model": args.model, "ckpt": args.ckpt, **result}))


MAGIC = b"RCN1"


def cmd_compress(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realcamnet_tpu.data.dataset import coord_map, pack_bayer_np
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.train.checkpoint import restore_params

    model, _ = _build_model(args.model)
    raw = np.load(args.input)
    if raw.ndim == 2 or raw.shape[-1] == 1:
        packed = pack_bayer_np(raw)
    else:
        packed = raw
    packed = packed[None].astype(np.float32)
    coord = coord_map(packed.shape[1], packed.shape[2])[None]
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(packed),
                                 jnp.asarray(packed), jnp.asarray(coord))
    if args.ckpt:
        params = restore_params(args.ckpt, params)
    codec = ChARMCodec(model, params)
    codec.update()
    out = codec.compress(jnp.asarray(packed), jnp.asarray(packed),
                         jnp.asarray(coord))
    y_str, z_str = out["strings"][0][0], out["strings"][1][0]
    with open(args.output, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<HHII", out["shape"][0], out["shape"][1],
                            len(y_str), len(z_str)))
        f.write(y_str)
        f.write(z_str)
    npx = packed.shape[1] * packed.shape[2] * 4
    print(json.dumps({"bytes": len(y_str) + len(z_str) + 16,
                      "bpp": (len(y_str) + len(z_str)) * 8 / npx}))


def cmd_decompress(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.train.checkpoint import restore_params

    model, _ = _build_model(args.model)
    with open(args.input, "rb") as f:
        assert f.read(4) == MAGIC, "bad bitstream magic"
        hz, wz, ny, nz = struct.unpack("<HHII", f.read(12))
        y_str = f.read(ny)
        z_str = f.read(nz)
    # Params must match the encoder's checkpoint.
    hy, wy = hz * 4, wz * 4
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

    isp, r2b = _models()
    s = args.size
    if args.model == "groupmixformer":
        from realcamnet_tpu.models.groupmix import groupmixformer_tiny

        model = groupmixformer_tiny()
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
    (reference operating points, BASELINE.md)."""
    import copy

    from realcamnet_tpu.core.config import ExperimentConfig

    cfg = ExperimentConfig.load(args.config) if args.config else ExperimentConfig()
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
        if cfg.mesh.data:
            train_args += ["--mesh-data", str(cfg.mesh.data),
                           "--mesh-spatial", str(cfg.mesh.spatial)]
        main(train_args)
        from realcamnet_tpu.train.checkpoint import latest_checkpoint

        ckpt = latest_checkpoint(ckpt_dir) or ""
        main(["eval-rd", "--model", cfg.model.name, "--data", cfg.data.source,
              "--ckpt", ckpt, "--patch", str(cfg.train.patch),
              "--num-images", str(cfg.data.num_eval_images)])
        results.append({"lmbda": lmbda, "ckpt": ckpt})
    print(json.dumps({"sweep": results}))


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
                        "randomly-initialized net (wiring check only)")
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
    s.set_defaults(fn=cmd_sweep)

    pr = sub.add_parser("profile")
    pr.add_argument("--model", default="lite_isp_net_gfm_lsc")
    pr.add_argument("--size", type=int, default=256)
    pr.set_defaults(fn=cmd_profile)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
