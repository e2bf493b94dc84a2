"""Pure-transport wrANS check on the REAL chip: host C++ encode -> device
decode_segment scan, at the codec's true table set, with escapes, at
K in {64, 1024}. Isolates transport from the model (the 4K codec-level run
failed its lane-state check on chip while the same transport passes on CPU
— this determines whether the TPU transport itself is at fault).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 \
  python -u tools/chip_wrans_unit.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/root/repo/artifacts/wrans_chip_unit_r05.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from realcamnet_tpu.entropy import wrans
    from realcamnet_tpu.entropy.codec import ChARMCodec
    from realcamnet_tpu.models.raw2bit import raw_compression_tcm_final

    log(f"devices: {jax.devices()}")
    TINY = dict(config=(1, 1, 1, 1, 1, 1, 1), head_dim=(4,) * 7, n=8, m=20,
                num_slices=5)
    model = raw_compression_tcm_final(**TINY)
    k = jax.random.key(0)
    raw = jax.random.uniform(k, (1, 64, 64, 4))
    coord = jax.random.uniform(k, (1, 64, 64, 2))
    params = jax.jit(model.init)(jax.random.key(1), raw, raw, coord)
    codec = ChARMCodec(model, params)
    codec.update()
    tables = codec._wrans_tables()

    rng = np.random.default_rng(0)
    T = tables.cdf_lengths.shape[0]
    n = 3_000_000  # ~the 4K symbol count
    idx = rng.integers(0, T, n).astype(np.int32)
    offs = tables.offsets[idx]
    lens = tables.cdf_lengths[idx]
    sym = (offs + rng.integers(0, np.maximum(lens - 2, 1))).astype(np.int32)
    esc_sel = rng.random(n) < 0.001
    sym[esc_sel] = rng.integers(-50000, 50000, esc_sel.sum()).astype(np.int32)
    segs = [0, 391_680] + [391_680 + i * 521_664 for i in range(1, 5)]

    luts = wrans.build_decode_luts(tables)
    res = {"n": n, "tables": int(T)}
    for K in (64, 1024):
        fr = wrans.encode_lanes(sym, idx, segs, tables, K)
        base = np.zeros(K, np.int64)
        base[1:] = np.cumsum(fr.counts[:-1])
        st = jnp.asarray(fr.states)
        pt = jnp.asarray(base.astype(np.int32))
        words = jnp.asarray(fr.words.astype(np.uint32))
        outs = []
        starts = list(segs) + [n]
        log(f"K={K}: decoding {len(starts) - 1} segments on device")
        for s in range(len(starts) - 1):
            lo, hi = starts[s], starts[s + 1]
            nv = hi - lo
            pad = wrans.lane_pad(nv, K)
            idxp = jnp.asarray(np.concatenate(
                [idx[lo:hi], np.zeros(pad - nv, np.int32)]))
            dec = jax.jit(wrans.decode_segment,
                          static_argnames=("n_valid", "num_lanes"))
            syms, st, pt = dec(words, st, pt, idxp, luts,
                               n_valid=nv, num_lanes=K)
            outs.append(np.asarray(jax.device_get(syms))[:nv])
        dev = np.concatenate(outs)
        dev[fr.esc_pos] = fr.esc_val
        st_np = np.asarray(jax.device_get(st))
        ndiff = int((dev != sym).sum())
        state_ok = bool((st_np == wrans.W_LOW).all())
        res[f"K{K}"] = {
            "ndiff": ndiff, "state_ok": state_ok,
            "bad_lanes": int((st_np != wrans.W_LOW).sum()),
            "escapes": int(len(fr.esc_pos)),
        }
        log(f"K={K}: ndiff {ndiff}, state_ok {state_ok}, "
            f"bad lanes {res[f'K{K}']['bad_lanes']}")
        if ndiff:
            d = np.nonzero(dev != sym)[0]
            res[f"K{K}"]["first_diffs"] = [int(v) for v in d[:10]]
            res[f"K{K}"]["seg_starts"] = [int(v) for v in segs]
            log(f"  first diffs {d[:10]}")
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
