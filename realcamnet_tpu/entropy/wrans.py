"""wrANS: wide (multi-lane) rANS with a DEVICE-side decoder.

TPU-native redesign of the decode choreography the reference inherits from
CompressAI (`raw2bit.py:1982-2025`, `tcm.py:592-637`): instead of num_slices
serial host<->device round trips (host range decoder <-> device parameter
passes — tens of ms of fixed relay latency EACH through a remote-dispatch
backend), the range decoder itself runs on the device. K independent rANS
lanes decode in lock step inside `lax.scan`; CDF slot lookup is one gather
from a device-built (T, 65536) LUT; renormalization is at most one 16-bit
word read per symbol. The whole ChARM decode (z decode -> h_synth -> per-
slice params -> y decode -> LRP -> g_s) then compiles into ONE XLA program
with zero per-slice transfers (`ChARMCodec.compress_tpu/decompress_tpu`).

Format: see `csrc/rans.cpp` wrans_encode_lanes. Out-of-table symbols encode
the table's escape slot in-stream and ride an uncompressed int32 appendix,
so the lock-step loop needs no variable-length bypass reads (the CompressAI-
format host path in `entropy/coder.py` remains the parity/interop surface).

Rate overhead vs the single-stream host format: each lane carries a 4-byte
initial state + a 2-byte word count, ~6*K bytes/frame (~2-4%% at 4K with the
default K; reported honestly in the blob byte count).
"""

from __future__ import annotations

import ctypes
import struct
from typing import List, NamedTuple, Sequence, Tuple

import numpy as np

PRECISION = 16
PROB_SCALE = 1 << PRECISION
W_LOW = 1 << 16
MAGIC = b"WRN1"


# ---------------------------------------------------------------------------
# Host side: C++ lane encoder binding + blob format
# ---------------------------------------------------------------------------


def _lib():
    from realcamnet_tpu.entropy import coder

    lib = coder._load()
    if not hasattr(lib.wrans_encode_lanes, "_wrans_ready"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.wrans_encode_lanes.restype = ctypes.c_int64
        lib.wrans_encode_lanes.argtypes = [
            i32p, i32p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
            u32p, ctypes.c_int64, i32p, i32p,
            u16p, ctypes.c_int64, u32p, u32p,
            i32p, i32p, ctypes.c_int64, i64p,
        ]
        lib.wrans_encode_lanes._wrans_ready = True
    return lib


class WransFrame(NamedTuple):
    words: np.ndarray        # (W,) uint16, all lanes concatenated
    counts: np.ndarray       # (K,) uint32 words per lane
    states: np.ndarray       # (K,) uint32 initial decode states
    esc_pos: np.ndarray      # (E,) int32 global positions
    esc_val: np.ndarray      # (E,) int32 raw symbol values


def encode_lanes(symbols: np.ndarray, indexes: np.ndarray,
                 seg_starts: Sequence[int], tables, num_lanes: int,
                 esc_capacity: int = 1 << 16) -> WransFrame:
    """Encode one frame (all segments) into `num_lanes` lane streams.

    symbols/indexes: flat int32, concatenated segments in DECODE order.
    seg_starts: start offset of each segment. tables: entropy.codec.CdfTables.
    """
    lib = _lib()
    symbols = np.ascontiguousarray(symbols, np.int32).reshape(-1)
    indexes = np.ascontiguousarray(indexes, np.int32).reshape(-1)
    n = symbols.size
    assert indexes.size == n
    segs = np.ascontiguousarray(seg_starts, np.int64)
    cdfs = np.ascontiguousarray(tables.cdfs, np.uint32)
    lens = np.ascontiguousarray(tables.cdf_lengths, np.int32)
    offs = np.ascontiguousarray(tables.offsets, np.int32)
    cap = 2 * n + 4 * num_lanes + 64
    words = np.empty(cap, np.uint16)
    counts = np.empty(num_lanes, np.uint32)
    states = np.empty(num_lanes, np.uint32)
    esc_pos = np.empty(esc_capacity, np.int32)
    esc_val = np.empty(esc_capacity, np.int32)
    esc_n = ctypes.c_int64(0)

    def p(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    total = lib.wrans_encode_lanes(
        p(symbols, ctypes.c_int32), p(indexes, ctypes.c_int32), n,
        p(segs, ctypes.c_int64), len(segs), num_lanes,
        p(cdfs, ctypes.c_uint32), cdfs.shape[1], p(lens, ctypes.c_int32),
        p(offs, ctypes.c_int32),
        p(words, ctypes.c_uint16), cap, p(counts, ctypes.c_uint32),
        p(states, ctypes.c_uint32),
        p(esc_pos, ctypes.c_int32), p(esc_val, ctypes.c_int32), esc_capacity,
        ctypes.byref(esc_n))
    if total < 0:
        raise ValueError("wrans encode: capacity exceeded "
                         f"(escapes so far {esc_n.value})")
    e = esc_n.value
    return WransFrame(words[:total].copy(), counts, states,
                      esc_pos[:e].copy(), esc_val[:e].copy())


def pack_blob(frame: WransFrame) -> bytes:
    """Serialize one frame. Counts travel as uint16 when they fit (the
    common case), uint32 otherwise; total byte count is the honest rate."""
    wide = bool(frame.counts.max(initial=0) > 0xFFFF)
    head = MAGIC + struct.pack(
        "<IIIB", len(frame.counts), len(frame.words), len(frame.esc_pos),
        1 if wide else 0)
    cnts = frame.counts.astype(np.uint32 if wide else np.uint16)
    return b"".join([
        head, cnts.tobytes(), frame.states.astype(np.uint32).tobytes(),
        frame.words.astype(np.uint16).tobytes(),
        frame.esc_pos.astype(np.int32).tobytes(),
        frame.esc_val.astype(np.int32).tobytes(),
    ])


def unpack_blob(blob: bytes) -> WransFrame:
    assert blob[:4] == MAGIC, "bad wrANS magic"
    k, w, e, wide = struct.unpack("<IIIB", blob[4:17])
    o = 17
    ct = np.uint32 if wide else np.uint16
    counts = np.frombuffer(blob, ct, k, o).astype(np.uint32)
    o += counts.itemsize * k if wide else 2 * k
    states = np.frombuffer(blob, np.uint32, k, o); o += 4 * k
    words = np.frombuffer(blob, np.uint16, w, o); o += 2 * w
    esc_pos = np.frombuffer(blob, np.int32, e, o); o += 4 * e
    esc_val = np.frombuffer(blob, np.int32, e, o)
    return WransFrame(words, counts, states, esc_pos, esc_val)


# ---------------------------------------------------------------------------
# Reference decoder (numpy, host): the executable spec of the format.
# ---------------------------------------------------------------------------


def decode_lanes_np(frame: WransFrame, indexes: np.ndarray,
                    seg_starts: Sequence[int], tables,
                    num_lanes: int) -> np.ndarray:
    """Scalar reference decode (tests; the device decoder must match)."""
    cdfs = np.asarray(tables.cdfs, np.uint32)
    lens = np.asarray(tables.cdf_lengths, np.int64)
    offs = np.asarray(tables.offsets, np.int64)
    indexes = np.asarray(indexes, np.int64).reshape(-1)
    n = indexes.size
    starts = list(seg_starts) + [n]
    ptr = np.zeros(num_lanes, np.int64)
    base = np.concatenate([[0], np.cumsum(frame.counts.astype(np.int64))])
    st = frame.states.astype(np.uint64).copy()
    out = np.zeros(n, np.int64)
    for s in range(len(starts) - 1):
        lo, hi = starts[s], starts[s + 1]
        for p in range(lo, hi):
            j = (p - lo) % num_lanes
            t = int(indexes[p])
            cdf = cdfs[t]
            L = int(lens[t])
            cum = int(st[j]) & 0xFFFF
            v = int(np.searchsorted(cdf[:L - 1], cum, side="right")) - 1
            v = min(max(v, 0), L - 2)
            start, freq = int(cdf[v]), int(cdf[v + 1]) - int(cdf[v])
            st[j] = freq * (int(st[j]) >> 16) + cum - start
            if st[j] < W_LOW:
                w = (int(frame.words[base[j] + ptr[j]])
                     if ptr[j] < frame.counts[j] else 0)
                st[j] = (int(st[j]) << 16) | w
                ptr[j] += 1
            out[p] = v + offs[t]
    out[frame.esc_pos] = frame.esc_val
    assert np.all(st == W_LOW), "wrANS lane states did not return to W_LOW"
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# Device side: LUT build + lock-step lane decode (pure jax; used inside the
# codec's single-dispatch decompress program).
# ---------------------------------------------------------------------------


def build_decode_luts(tables):
    """Device decode tables from host CdfTables.

    Returns dict of jnp arrays:
      lut:  (T, 65536) int16  slot -> bucket value (searchsorted, clamped)
      cdf:  (T, stride) int32 quantized CDF rows
      off:  (T,) int32 symbol offsets
      esc:  (T,) int32 escape bucket (= cdf_length - 2)
    Built with one jitted searchsorted sweep per call — milliseconds on
    device, no multi-MB host->device table pushes.
    """
    import jax
    import jax.numpy as jnp

    cdfs = np.asarray(tables.cdfs, np.int64)
    lens = np.asarray(tables.cdf_lengths, np.int64)
    # Rows are zero beyond their length; force the tail monotone so
    # searchsorted stays in-bucket: entries >= length get PROB_SCALE.
    cols = np.arange(cdfs.shape[1])[None, :]
    rows = np.where(cols < (lens - 1)[:, None], cdfs, PROB_SCALE)

    @jax.jit
    def build(rows):
        slots = jnp.arange(PROB_SCALE, dtype=jnp.int32)

        def per_row(row, esc):
            v = jnp.searchsorted(row, slots, side="right") - 1
            return jnp.clip(v, 0, esc).astype(jnp.int16)

        esc = jnp.asarray(lens - 2, jnp.int32)
        return jax.vmap(per_row)(jnp.asarray(rows, jnp.int32), esc)

    import jax.numpy as jnp

    return {
        "lut": build(rows),
        "cdf": jnp.asarray(np.where(cols < lens[:, None], cdfs, PROB_SCALE),
                           jnp.int32),
        "off": jnp.asarray(tables.offsets, jnp.int32),
        "esc": jnp.asarray(lens - 2, jnp.int32),
    }


def decode_segment(words, state, ptr, idx_flat, luts, n_valid: int,
                   num_lanes: int):
    """Decode one segment's symbols inside a jit.

    words: (W,) uint32 (widened uint16 stream, all lanes concatenated).
    state: (K,) uint32 lane states. ptr: (K,) int32 absolute word indexes
    (per-lane stream base already added). idx_flat: (n_pad,) int32
    per-symbol table indexes, n_pad % K == 0, entries past n_valid masked
    (pad with any valid table index, e.g. 0). Returns (symbols (n_pad,)
    int32, state, ptr).

    Lock-step decode: each scan step advances all K lanes by one symbol —
    a handful of VPU ops + 3 gathers; renorm is a single masked word read
    (16-bit renorm guarantees <= 1 read/symbol).
    """
    import jax
    import jax.numpy as jnp

    n_pad = idx_flat.shape[0]
    assert n_pad % num_lanes == 0
    steps = n_pad // num_lanes
    idx_steps = idx_flat.reshape(steps, num_lanes)
    active_steps = (jnp.arange(steps * num_lanes, dtype=jnp.int32)
                    .reshape(steps, num_lanes) < n_valid)
    lut, cdf, off = luts["lut"], luts["cdf"], luts["off"]
    stride = cdf.shape[1]

    def body(carry, inp):
        st, pt = carry
        idx, act = inp
        cum = (st & jnp.uint32(0xFFFF)).astype(jnp.int32)
        v = lut.reshape(-1)[idx * PROB_SCALE + cum].astype(jnp.int32)
        row = idx * stride + v
        start = cdf.reshape(-1)[row]
        freq = cdf.reshape(-1)[row + 1] - start
        new = (freq.astype(jnp.uint32) * (st >> jnp.uint32(16))
               + cum.astype(jnp.uint32) - start.astype(jnp.uint32))
        need = (new < jnp.uint32(W_LOW)) & act
        w = words[jnp.clip(pt, 0, words.shape[0] - 1)]
        renormed = (new << jnp.uint32(16)) | w
        new = jnp.where(need, renormed, new)
        st = jnp.where(act, new, st)
        pt = pt + need.astype(jnp.int32)
        sym = v + off[idx]
        return (st, pt), sym

    state = state.astype(jnp.uint32)
    words = words.astype(jnp.uint32)
    (state, ptr), syms = jax.lax.scan(body, (state, ptr),
                                      (idx_steps, active_steps))
    return syms.reshape(-1), state, ptr


def lane_pad(n: int, num_lanes: int) -> int:
    return -(-n // num_lanes) * num_lanes
