"""Host-side rANS coder: ctypes bindings to csrc/rans.cpp (+ build logic).

API mirrors the call shapes the reference uses (SURVEY.md §3.3-3.4):
`RansEncoder.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths,
offsets) -> bytes` and a streaming `RansDecoder.set_stream / decode_stream`
that interleaves with device work in the ChARM decode loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "librans.so")
_lib = None


def _build_lib():
    subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_CSRC, "rans.cpp")
    ):
        _build_lib()
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rans_encode_with_indexes.restype = ctypes.c_int64
    lib.rans_encode_with_indexes.argtypes = [
        i32p, i32p, ctypes.c_int64, u32p, ctypes.c_int64, i32p, i32p, u8p, ctypes.c_int64,
    ]
    lib.rans_decoder_new.restype = ctypes.c_void_p
    lib.rans_decoder_new.argtypes = [u8p, ctypes.c_int64]
    lib.rans_decoder_free.argtypes = [ctypes.c_void_p]
    lib.rans_decode_stream.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, u32p, ctypes.c_int64, i32p, i32p, i32p,
    ]
    lib.rans_decode_with_indexes.argtypes = [
        u8p, ctypes.c_int64, i32p, ctypes.c_int64, u32p, ctypes.c_int64, i32p, i32p, i32p,
    ]
    _lib = lib
    return lib


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), np.int32)


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


class RansEncoder:
    """Buffered encoder: accumulate (symbols, indexes), flush to one stream."""

    def __init__(self):
        self._symbols = []
        self._indexes = []

    def encode_with_indexes(self, symbols, indexes, cdfs=None, cdf_lengths=None, offsets=None):
        self._symbols.append(_as_i32(symbols))
        self._indexes.append(_as_i32(indexes))
        if cdfs is not None:
            self._tables = (cdfs, cdf_lengths, offsets)

    def flush(self, cdfs=None, cdf_lengths=None, offsets=None) -> bytes:
        if cdfs is None:
            cdfs, cdf_lengths, offsets = self._tables
        symbols = np.concatenate(self._symbols) if self._symbols else np.zeros(0, np.int32)
        indexes = np.concatenate(self._indexes) if self._indexes else np.zeros(0, np.int32)
        self._symbols, self._indexes = [], []
        return encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    lib = _load()
    symbols = _as_i32(symbols)
    indexes = _as_i32(indexes)
    cdfs = np.ascontiguousarray(cdfs, np.uint32)
    cdf_lengths = _as_i32(cdf_lengths)
    offsets = _as_i32(offsets)
    n = symbols.size
    assert indexes.size == n
    capacity = max(1024, n * 16 + 1024)
    out = np.zeros(capacity, np.uint8)
    written = lib.rans_encode_with_indexes(
        _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32), n,
        _ptr(cdfs, ctypes.c_uint32), cdfs.shape[1], _ptr(cdf_lengths, ctypes.c_int32),
        _ptr(offsets, ctypes.c_int32), _ptr(out, ctypes.c_uint8), capacity,
    )
    if written < 0:
        raise RuntimeError("rANS encode buffer overflow")
    return bytes(out[:written].tobytes())


class RansDecoder:
    """Streaming decoder over one byte stream (C-side rANS state)."""

    def __init__(self):
        self._handle = None
        self._buf = None

    def set_stream(self, data: bytes):
        lib = _load()
        self.close()
        self._buf = np.frombuffer(data, np.uint8).copy()
        if self._buf.size == 0:
            self._buf = np.zeros(4, np.uint8)
        self._handle = lib.rans_decoder_new(_ptr(self._buf, ctypes.c_uint8), self._buf.size)

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
        assert self._handle is not None, "call set_stream first"
        lib = _load()
        indexes = _as_i32(indexes)
        cdfs = np.ascontiguousarray(cdfs, np.uint32)
        cdf_lengths = _as_i32(cdf_lengths)
        offsets = _as_i32(offsets)
        out = np.zeros(indexes.size, np.int32)
        lib.rans_decode_stream(
            self._handle, _ptr(indexes, ctypes.c_int32), indexes.size,
            _ptr(cdfs, ctypes.c_uint32), cdfs.shape[1],
            _ptr(cdf_lengths, ctypes.c_int32), _ptr(offsets, ctypes.c_int32),
            _ptr(out, ctypes.c_int32),
        )
        return out

    def close(self):
        if self._handle is not None:
            _load().rans_decoder_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_with_indexes(data: bytes, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
    dec = RansDecoder()
    dec.set_stream(data)
    out = dec.decode_stream(indexes, cdfs, cdf_lengths, offsets)
    dec.close()
    return out
