"""Throughput benchmark for the C++ rANS coder (csrc/rans.cpp).

Simulates the flagship 4K workload: the y-latent at 4K is
(320, 2160/32, 3840/32) = 320*68*120 ~ 2.6M symbols/frame with
Gaussian-conditional scales (64-level scale table, `tcm.py:26-34`).
Writes tools/rans_bench.json. Pure host — no TPU needed.

Usage: python tools/bench_rans.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realcamnet_tpu.entropy.codec import build_gaussian_tables  # noqa: E402
from realcamnet_tpu.entropy.coder import (  # noqa: E402
    RansDecoder,
    RansEncoder,
)


def main():
    rng = np.random.default_rng(0)
    # 4K y-latent: 320ch at (68, 120) after /32.
    n = 320 * 68 * 120
    tables = build_gaussian_tables()
    cdfs, cdf_lengths, offsets = (tables.cdfs, tables.cdf_lengths,
                                  tables.offsets)
    scale_table = np.exp(np.linspace(np.log(0.11), np.log(256.0), 64))

    # Symbols: quantized zero-mean gaussians at mixed scales (rate-realistic:
    # most latents are near-deterministic, a few carry signal).
    indexes = rng.integers(0, 20, size=n).astype(np.int32)
    scales = scale_table[indexes]
    symbols = np.round(rng.normal(0.0, scales)).astype(np.int32)

    enc = RansEncoder()
    t0 = time.perf_counter()
    enc.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)
    data = enc.flush(cdfs, cdf_lengths, offsets)
    t_enc = time.perf_counter() - t0

    dec = RansDecoder()
    dec.set_stream(data)
    t0 = time.perf_counter()
    out = dec.decode_stream(indexes, cdfs, cdf_lengths, offsets)
    t_dec = time.perf_counter() - t0
    assert np.array_equal(out, symbols), "round-trip mismatch"

    result = {
        "symbols": int(n),
        "bytes": len(data),
        "encode_msym_per_s": round(n / t_enc / 1e6, 2),
        "decode_msym_per_s": round(n / t_dec / 1e6, 2),
        "encode_ms_per_4k_frame": round(t_enc * 1e3, 2),
        "decode_ms_per_4k_frame": round(t_dec * 1e3, 2),
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(__file__), "rans_bench.json"),
              "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
