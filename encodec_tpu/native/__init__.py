"""Native (C++) runtime components, loaded via ctypes.

`libencodec_ac.so` implements the arithmetic-coding hot loop — the one
inherently-sequential, byte-level part of the codec that stays on the host
while the TPU does batched compute. The bitstream is bit-exact with the
Python coder (`encodec_tpu.stream.ac`), which remains the always-available
fallback; `available()` tells you which one you're on.

The library is built on demand with g++ (cached next to this file); use
`make -C encodec_tpu/native` to prebuild.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import typing as tp

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libencodec_ac.so")
_lib: tp.Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "ac.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _stale() -> bool:
    src = os.path.join(_DIR, "ac.cpp")
    try:
        return os.path.getmtime(_SO) < os.path.getmtime(src)
    except OSError:
        return True


def _load() -> tp.Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if (not os.path.exists(_SO) or _stale()) and not _build():
        if not os.path.exists(_SO):
            return None
    try:
        lib = ctypes.CDLL(_SO)
        i64, i32 = ctypes.c_int64, ctypes.c_int32
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        # every binding sits inside the try: a stale/partial library
        # missing ANY symbol degrades to the Python fallback instead of
        # raising out of available()
        lib.ac_encode_batch.restype = i64
        lib.ac_encode_batch.argtypes = [i32p, i64p, i64, i32, u8p, i64]
        lib.ac_encode_bounds.restype = i64
        lib.ac_encode_bounds.argtypes = [i64p, i64p, i64, u8p, i64]
        lib.ac_decode_batch.restype = i64
        lib.ac_decode_batch.argtypes = [i64p, i64, i32, u8p, i64, i32p]
        lib.ac_enc_new.restype = ctypes.c_void_p
        lib.ac_enc_push.restype = i32
        lib.ac_enc_push.argtypes = [ctypes.c_void_p, i32, i64p, i32]
        lib.ac_enc_finish.restype = i64
        lib.ac_enc_finish.argtypes = [ctypes.c_void_p, u8p, i64]
        lib.ac_enc_free.argtypes = [ctypes.c_void_p]
        lib.ac_dec_new.restype = ctypes.c_void_p
        lib.ac_dec_new.argtypes = [u8p, i64]
        lib.ac_dec_pull.restype = i32
        lib.ac_dec_pull.argtypes = [ctypes.c_void_p, i64p, i32]
        lib.ac_dec_free.argtypes = [ctypes.c_void_p]
    except (OSError, AttributeError):
        return None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_i64p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def encode_batch(symbols: np.ndarray, cdfs: np.ndarray) -> bytes:
    """Arithmetic-encode `symbols [N]` against per-step `cdfs [N, card]`."""
    lib = _load()
    assert lib is not None
    symbols = np.ascontiguousarray(symbols, np.int32)
    cdfs = np.ascontiguousarray(cdfs, np.int64)
    n, card = cdfs.shape
    cap = max(1024, 8 * n)  # generous: worst case ~ total_range_bits/step
    out = np.empty(cap, np.uint8)
    size = lib.ac_encode_batch(
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _as_i64p(cdfs), n, card,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if size == -2:
        raise RuntimeError("arithmetic coder overflow (max_bit > 61)")
    assert size >= 0, "native AC output buffer overflow"
    return out[:size].tobytes()


def encode_bounds(lows: np.ndarray, highs: np.ndarray) -> bytes:
    """Arithmetic-encode from per-symbol CDF bounds (device-built CDFs)."""
    lib = _load()
    assert lib is not None
    lows = np.ascontiguousarray(lows, np.int64)
    highs = np.ascontiguousarray(highs, np.int64)
    n = len(lows)
    cap = max(1024, 8 * n)
    out = np.empty(cap, np.uint8)
    size = lib.ac_encode_bounds(
        _as_i64p(lows), _as_i64p(highs), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if size == -2:
        raise RuntimeError("arithmetic coder overflow (max_bit > 61)")
    assert size >= 0, "native AC output buffer overflow"
    return out[:size].tobytes()


def decode_batch(data: bytes, cdfs: np.ndarray) -> np.ndarray:
    """Decode `N = cdfs.shape[0]` symbols from an AC stream."""
    lib = _load()
    assert lib is not None
    cdfs = np.ascontiguousarray(cdfs, np.int64)
    n, card = cdfs.shape
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.int32)
    got = lib.ac_decode_batch(
        _as_i64p(cdfs), n, card,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if got == -2:
        raise RuntimeError("arithmetic coder overflow (max_bit > 61)")
    if got == -4:
        # corrupted payload, NOT a truncated one — same exception the
        # Python decoder raises for this state
        raise RuntimeError("Binary search failed")
    if got != n:
        raise EOFError("The stream ended sooner than expected.")
    return out


class StreamingEncoder:
    """Stateful native encoder — the fast sibling of
    `stream.ac.ArithmeticCoder` for callers that produce one CDF row at a
    time (bitstream bit-exact with the Python coder and the batch APIs)."""

    def __init__(self):
        lib = _load()
        assert lib is not None
        self._lib = lib
        self._h = lib.ac_enc_new()

    def push(self, symbol: int, cdf: np.ndarray) -> None:
        cdf = np.ascontiguousarray(cdf, np.int64)
        rc = self._lib.ac_enc_push(self._h, int(symbol), _as_i64p(cdf),
                                   len(cdf))
        if rc == -2:
            raise RuntimeError("arithmetic coder overflow (max_bit > 61)")

    def finish(self) -> bytes:
        cap = 1024
        while True:
            out = np.empty(cap, np.uint8)
            size = self._lib.ac_enc_finish(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                cap)
            if size == -2:
                raise RuntimeError(
                    "arithmetic coder overflow (max_bit > 61)")
            if size >= 0:
                return out[:size].tobytes()
            cap *= 4  # -1: buffer too small

    def close(self):
        if self._h:
            self._lib.ac_enc_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class StreamingDecoder:
    """Stateful native decoder for LM-interleaved decompression."""

    def __init__(self, data: bytes):
        lib = _load()
        assert lib is not None
        self._lib = lib
        buf = np.frombuffer(data, np.uint8)
        self._buf = buf  # keep alive until ac_dec_new copies
        self._h = lib.ac_dec_new(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf))

    def pull(self, cdf: np.ndarray) -> tp.Optional[int]:
        cdf = np.ascontiguousarray(cdf, np.int64)
        sym = self._lib.ac_dec_pull(self._h, _as_i64p(cdf), len(cdf))
        if sym == -1:
            return None
        if sym == -3:
            raise RuntimeError("arithmetic coder overflow (max_bit > 61)")
        if sym < 0:
            raise RuntimeError("Binary search failed")
        return int(sym)

    def close(self):
        if self._h:
            self._lib.ac_dec_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
