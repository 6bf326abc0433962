"""ctypes bindings for the pcgc_native C++ runtime.

The shared library auto-compiles from ``src/`` on first import (g++, cached
by source hash under ``_build/``). FP flags matter: ``-ffp-contract=off`` and
no fast-math, so the deterministic math in det_math.h stays bit-exact (see
the header comments; this is the fix for the reference's decode bug,
NJUVISION/PCGCv1 README.md:111-114).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_SOURCES = ["det_math.h", "range_coder.h", "pcgc_native.cc"]

_CXXFLAGS = [
    "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
    "-ffp-contract=off", "-fno-fast-math", "-Wall",
]


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    h = hashlib.sha256()
    for s in _SOURCES:
        with open(os.path.join(_SRC_DIR, s), "rb") as f:
            h.update(f.read())
    h.update(" ".join(_CXXFLAGS).encode())
    tag = h.hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"pcgc_native_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = (["g++"] + _CXXFLAGS +
               ["-o", tmp, os.path.join(_SRC_DIR, "pcgc_native.cc")])
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    return so_path


_lib = ctypes.CDLL(_build())

_i8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_f32p = ctypes.POINTER(ctypes.c_float)
_i32 = ctypes.c_int32
_i64 = ctypes.c_int64

_lib.pcgc_version.restype = ctypes.c_int

_lib.pcgc_laplace_encode.restype = _i64
_lib.pcgc_laplace_encode.argtypes = [
    _i32p, _f32p, _f32p, _i64, _i32, _i32, _i8p, _i64]
_lib.pcgc_laplace_decode.restype = ctypes.c_int
_lib.pcgc_laplace_decode.argtypes = [
    _i8p, _i64, _i64, _f32p, _f32p, _i32, _i32, _i32p]
_lib.pcgc_laplace_encode_batch.restype = ctypes.c_int
_lib.pcgc_laplace_encode_batch.argtypes = [
    _i32p, _f32p, _f32p, _i32, _i64, _i32p, _i32p, _i8p, _i64, _i64p]
_lib.pcgc_laplace_decode_batch.restype = ctypes.c_int
_lib.pcgc_laplace_decode_batch.argtypes = [
    _i8p, _i64p, _i64p, _i32, _i64, _i32p, _i32p, _f32p, _f32p, _i32p]

_i8sp = ctypes.POINTER(ctypes.c_int8)
_lib.pcgc_laplace_q_encode_batch.restype = ctypes.c_int
_lib.pcgc_laplace_q_encode_batch.argtypes = [
    _i32p, _i8sp, _i8p, _i32, _i64, _i32p, _i32p, _i8p, _i64, _i64p]
_lib.pcgc_laplace_q_decode_batch.restype = ctypes.c_int
_lib.pcgc_laplace_q_decode_batch.argtypes = [
    _i8p, _i64p, _i64p, _i32, _i64, _i32p, _i32p, _i8sp, _i8p, _i32p]

_lib.pcgc_factorized_cdf.restype = None
_lib.pcgc_factorized_cdf.argtypes = [
    _f32p, _f32p, _f32p, _i32, _i32, _i32p, _i32, _i32, _u32p]
_lib.pcgc_cdf_encode.restype = _i64
_lib.pcgc_cdf_encode.argtypes = [_i32p, _i64, _i32, _i32, _u32p, _i8p, _i64]
_lib.pcgc_cdf_decode.restype = ctypes.c_int
_lib.pcgc_cdf_decode.argtypes = [_i8p, _i64, _i64, _i32, _i32, _u32p, _i32p]

_lib.pcgc_octree_encode.restype = _i64
_lib.pcgc_octree_encode.argtypes = [_u32p, _i64, _i32, _i8p, _i64]
_lib.pcgc_octree_decode.restype = _i64
_lib.pcgc_octree_decode.argtypes = [_i8p, _i64, _i32, _u32p, _i64]

_u16p = ctypes.POINTER(ctypes.c_uint16)
_lib.pcgc_rans_mask_decode.restype = ctypes.c_int
_lib.pcgc_rans_mask_decode.argtypes = [
    _u16p, _i64, _u32p, _i32, _i32p, _i8p, _i64]


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _as(arr, dtype):
    return np.ascontiguousarray(arr, dtype=dtype)


def version():
    return _lib.pcgc_version()


def laplace_encode(values, loc, scale, min_v, max_v):
    """Range-encode int symbols under per-element Laplace(loc, scale).

    Args: flat arrays of equal length. Returns bytes.
    """
    v = _as(values, np.int32).reshape(-1)
    lo = _as(loc, np.float32).reshape(-1)
    sc = _as(scale, np.float32).reshape(-1)
    n = v.size
    cap = 4 * n + 1024
    out = np.empty(cap, np.uint8)
    sz = _lib.pcgc_laplace_encode(
        _ptr(v, ctypes.c_int32), _ptr(lo, ctypes.c_float),
        _ptr(sc, ctypes.c_float), n, int(min_v), int(max_v),
        _ptr(out, ctypes.c_uint8), cap)
    if sz < 0:
        raise ValueError("laplace_encode failed (symbol out of range?)")
    return out[:sz].tobytes()


def laplace_decode(data, n, loc, scale, min_v, max_v):
    buf = np.frombuffer(data, np.uint8)
    lo = _as(loc, np.float32).reshape(-1)
    sc = _as(scale, np.float32).reshape(-1)
    v = np.empty(n, np.int32)
    _lib.pcgc_laplace_decode(
        _ptr(buf, ctypes.c_uint8), buf.size, n, _ptr(lo, ctypes.c_float),
        _ptr(sc, ctypes.c_float), int(min_v), int(max_v),
        _ptr(v, ctypes.c_int32))
    return v


def laplace_encode_batch(values, loc, scale, min_vs, max_vs):
    """Encode B independent items in parallel.

    Args:
      values/loc/scale: [B, elems] arrays.
      min_vs/max_vs: int [B].
    Returns: list of B byte strings.
    """
    v = _as(values, np.int32)
    B, elems = v.shape[0], int(np.prod(v.shape[1:]))
    v = v.reshape(B, elems)
    lo = _as(loc, np.float32).reshape(B, elems)
    sc = _as(scale, np.float32).reshape(B, elems)
    mn = _as(min_vs, np.int32)
    mx = _as(max_vs, np.int32)
    cap = 4 * elems + 1024
    out = np.empty((B, cap), np.uint8)
    lens = np.empty(B, np.int64)
    err = _lib.pcgc_laplace_encode_batch(
        _ptr(v, ctypes.c_int32), _ptr(lo, ctypes.c_float),
        _ptr(sc, ctypes.c_float), B, elems, _ptr(mn, ctypes.c_int32),
        _ptr(mx, ctypes.c_int32), _ptr(out, ctypes.c_uint8), cap,
        _ptr(lens, ctypes.c_int64))
    if err != 0:
        raise ValueError("laplace_encode_batch failed")
    return [out[b, :lens[b]].tobytes() for b in range(B)]


def laplace_decode_batch(strings, elems, loc, scale, min_vs, max_vs):
    """Decode B independent items in parallel. Returns int32 [B, elems]."""
    B = len(strings)
    bufs = np.frombuffer(b"".join(strings) or b"\0", np.uint8)
    lens = np.array([len(s) for s in strings], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    lo = _as(loc, np.float32).reshape(B, elems)
    sc = _as(scale, np.float32).reshape(B, elems)
    mn = _as(min_vs, np.int32)
    mx = _as(max_vs, np.int32)
    v = np.empty((B, elems), np.int32)
    _lib.pcgc_laplace_decode_batch(
        _ptr(bufs, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64),
        _ptr(lens, ctypes.c_int64), B, elems, _ptr(mn, ctypes.c_int32),
        _ptr(mx, ctypes.c_int32), _ptr(lo, ctypes.c_float),
        _ptr(sc, ctypes.c_float), _ptr(v, ctypes.c_int32))
    return v


def laplace_q_encode_batch(values, loc_q, scale_q, min_vs, max_vs):
    """Quantized-prior batch encode: loc = loc_q/8 (int8), scale =
    2^(scale_q/8 - 20) (uint8). Returns list of B byte strings."""
    v = _as(values, np.int32)
    B, elems = v.shape[0], int(np.prod(v.shape[1:]))
    v = v.reshape(B, elems)
    lo = _as(loc_q, np.int8).reshape(B, elems)
    sc = _as(scale_q, np.uint8).reshape(B, elems)
    mn = _as(min_vs, np.int32)
    mx = _as(max_vs, np.int32)
    cap = 4 * elems + 1024
    out = np.empty((B, cap), np.uint8)
    lens = np.empty(B, np.int64)
    err = _lib.pcgc_laplace_q_encode_batch(
        _ptr(v, ctypes.c_int32), _ptr(lo, ctypes.c_int8),
        _ptr(sc, ctypes.c_uint8), B, elems, _ptr(mn, ctypes.c_int32),
        _ptr(mx, ctypes.c_int32), _ptr(out, ctypes.c_uint8), cap,
        _ptr(lens, ctypes.c_int64))
    if err != 0:
        raise ValueError("laplace_q_encode_batch failed")
    return [out[b, :lens[b]].tobytes() for b in range(B)]


def laplace_q_decode_batch(strings, elems, loc_q, scale_q, min_vs, max_vs):
    """Quantized-prior batch decode. Returns int32 [B, elems]."""
    B = len(strings)
    bufs = np.frombuffer(b"".join(strings) or b"\0", np.uint8)
    lens = np.array([len(s) for s in strings], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    lo = _as(loc_q, np.int8).reshape(B, elems)
    sc = _as(scale_q, np.uint8).reshape(B, elems)
    mn = _as(min_vs, np.int32)
    mx = _as(max_vs, np.int32)
    v = np.empty((B, elems), np.int32)
    _lib.pcgc_laplace_q_decode_batch(
        _ptr(bufs, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64),
        _ptr(lens, ctypes.c_int64), B, elems, _ptr(mn, ctypes.c_int32),
        _ptr(mx, ctypes.c_int32), _ptr(lo, ctypes.c_int8),
        _ptr(sc, ctypes.c_uint8), _ptr(v, ctypes.c_int32))
    return v


def factorized_cdf(matrices, biases, factors, dims, min_v, max_v):
    """Quantized CDF tables [C, N+1] for the factorized entropy model.

    matrices: [C, sum(dims[i+1]*dims[i])] float32 (raw, pre-softplus).
    biases/factors: [C, sum(dims[i+1])] float32 (factor raw, pre-tanh).
    dims: stage widths, e.g. (1, 3, 3, 3, 1).
    """
    m = _as(matrices, np.float32)
    b = _as(biases, np.float32)
    f = _as(factors, np.float32)
    C = m.shape[0]
    dims = _as(dims, np.int32)
    N = int(max_v) - int(min_v) + 1
    out = np.empty((C, N + 1), np.uint32)
    _lib.pcgc_factorized_cdf(
        _ptr(m, ctypes.c_float), _ptr(b, ctypes.c_float),
        _ptr(f, ctypes.c_float), C, len(dims) - 1,
        _ptr(dims, ctypes.c_int32), int(min_v), int(max_v),
        _ptr(out, ctypes.c_uint32))
    return out


def cdf_encode(values, qcdf):
    """Encode [M, C] symbols (in [0, N)) against per-channel tables."""
    v = _as(values, np.int32)
    M, C = v.shape
    q = _as(qcdf, np.uint32)
    N = q.shape[1] - 1
    cap = 4 * M * C + 1024
    out = np.empty(cap, np.uint8)
    sz = _lib.pcgc_cdf_encode(
        _ptr(v, ctypes.c_int32), M, C, N, _ptr(q, ctypes.c_uint32),
        _ptr(out, ctypes.c_uint8), cap)
    if sz < 0:
        raise ValueError("cdf_encode failed (symbol out of range?)")
    return out[:sz].tobytes()


def cdf_decode(data, M, qcdf):
    buf = np.frombuffer(data, np.uint8)
    q = _as(qcdf, np.uint32)
    C, N = q.shape[0], q.shape[1] - 1
    v = np.empty((M, C), np.int32)
    _lib.pcgc_cdf_decode(
        _ptr(buf, ctypes.c_uint8), buf.size, M, C, N,
        _ptr(q, ctypes.c_uint32), _ptr(v, ctypes.c_int32))
    return v


def octree_encode(coords, depth):
    """Losslessly encode unique non-negative int coords [n,3] < 2^depth."""
    c = _as(coords, np.uint32)
    n = c.shape[0]
    cap = 2 * n + 4096
    out = np.empty(cap, np.uint8)
    sz = _lib.pcgc_octree_encode(
        _ptr(c, ctypes.c_uint32), n, int(depth), _ptr(out, ctypes.c_uint8),
        cap)
    if sz < 0:
        raise ValueError("octree_encode failed (coord >= 2^depth?)")
    return out[:sz].tobytes()


def octree_decode(data, depth, max_points):
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((max_points, 3), np.uint32)
    n = _lib.pcgc_octree_decode(
        _ptr(buf, ctypes.c_uint8), buf.size, int(depth),
        _ptr(out, ctypes.c_uint32), max_points)
    if n < 0:
        raise ValueError("octree_decode failed")
    return out[:n].astype(np.int32)


def rans_mask_decode(words, states, hist, n_bytes):
    """Decode one device mask-wire rANS unit (entropy/rans.py mask_encode)
    back to the bit-packed mask bytes. words uint16 [count], states uint32
    [L] (the encoder's final states), hist int32 [16] (the scaled
    histogram that shipped with the stream)."""
    words = np.ascontiguousarray(words, np.uint16)
    states = np.ascontiguousarray(states, np.uint32)
    hist = np.ascontiguousarray(hist, np.int32)
    out = np.empty(int(n_bytes), np.uint8)
    rc = _lib.pcgc_rans_mask_decode(
        _ptr(words, ctypes.c_uint16), words.size,
        _ptr(states, ctypes.c_uint32), states.size,
        _ptr(hist, ctypes.c_int32), _ptr(out, ctypes.c_uint8),
        out.size)
    if rc != 0:
        raise ValueError(
            f"mask-wire rANS decode failed (code {rc}): corrupt stream "
            "or encoder/decoder histogram mismatch")
    return out
