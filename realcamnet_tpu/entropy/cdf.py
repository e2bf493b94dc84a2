"""Quantized-CDF table construction for the rANS coder.

Equivalent of CompressAI's C++ `pmf_to_quantized_cdf` (reference dependency,
SURVEY.md §2.6): float pmf -> 16-bit integer CDF with a trailing escape
bucket carrying the tail mass. Every bucket gets frequency >= 1 (stolen from
the largest bucket) so any symbol is codable.
"""

from __future__ import annotations

import numpy as np

PRECISION = 16
TOTAL = 1 << PRECISION


def pmf_to_quantized_cdf(pmf: np.ndarray, tail_mass: float) -> np.ndarray:
    """pmf (L,) float -> quantized cdf (L+2,) uint32: L symbol buckets + 1
    escape bucket; cdf[0]=0, cdf[-1]=2^16."""
    pmf = np.asarray(pmf, np.float64)
    probs = np.concatenate([np.maximum(pmf, 0.0), [max(float(tail_mass), 0.0)]])
    total = probs.sum()
    if total <= 0:
        probs = np.ones_like(probs)
        total = probs.sum()
    freqs = np.floor(probs / total * TOTAL).astype(np.int64)
    # Largest-remainder distribution of the leftover mass.
    remainder = TOTAL - freqs.sum()
    if remainder > 0:
        frac = probs / total * TOTAL - freqs
        order = np.argsort(-frac)
        freqs[order[: int(remainder)]] += 1
    # Ensure min frequency 1 by stealing from the largest bucket.
    for i in np.nonzero(freqs == 0)[0]:
        j = int(np.argmax(freqs))
        if freqs[j] <= 1:
            raise ValueError("cannot normalize pmf: too many symbols")
        freqs[j] -= 1
        freqs[i] += 1
    cdf = np.zeros(len(freqs) + 1, np.uint32)
    cdf[1:] = np.cumsum(freqs)
    assert cdf[-1] == TOTAL
    return cdf


def build_cdf_tables(pmfs: np.ndarray, tail_masses: np.ndarray,
                     pmf_lengths: np.ndarray, offsets: np.ndarray):
    """Stack per-table CDFs into the (T, stride) layout the C coder expects.

    Returns (cdfs uint32 (T, max_len+2), cdf_lengths int32, offsets int32).
    cdf_lengths[t] counts valid entries of row t (= pmf_lengths[t] + 2).
    """
    pmfs = np.asarray(pmfs)
    T = pmfs.shape[0]
    pmf_lengths = np.asarray(pmf_lengths, np.int64)
    max_len = int(pmf_lengths.max())
    cdfs = np.zeros((T, max_len + 2), np.uint32)
    cdf_lengths = np.zeros((T,), np.int32)
    for t in range(T):
        L = int(pmf_lengths[t])
        cdf = pmf_to_quantized_cdf(pmfs[t, :L], float(tail_masses[t]))
        cdfs[t, : L + 2] = cdf
        cdf_lengths[t] = L + 2
    return cdfs, cdf_lengths, np.asarray(offsets, np.int32)
