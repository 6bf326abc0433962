"""On-device interleaved rANS entropy coder (pure JAX, integer-exact).

TPU-native replacement for host-side range coding of the latents. The
reference codes `y` on the CPU with TF's C++ range coder fed by float CDFs
computed on the accelerator (conditional_entropy_model.py:95-201 in
NJUVISION/PCGCv1) — every encode AND decode must ship per-voxel float
(loc, scale) across the device/host boundary, and float non-determinism
between the encoder's and decoder's CDF evaluation is the reference's known
decode-mismatch bug (its README.md:111-114).

This module instead runs the entire entropy-coding loop on the accelerator:

- **Quantized CDFs in pure integer arithmetic**: either evaluated per
  element from Laplace prior transport codes (`qcdf`: loc_q = round(8*loc)
  int8, scale_q = round(8*(log2(scale)+20)) uint8 — int32/uint32 ops plus
  a cubic exp2, bit-exact on any backend), or looked up from per-lane
  quantized CDF **tables** (factorized model; tables built by the
  deterministic C++ runtime from the checkpoint weights).
- **Interleaved rANS** (Duda's asymmetric numeral system, Giesen's
  interleaving): L independent 32-bit lane states share one word stream.
  Element e of the flat symbol sequence belongs to lane `e % L` at step
  `e // L`; all lanes advance in lockstep, one symbol per `lax.scan` step,
  emitting/consuming at most one uint16 word per step (precision 16 makes
  renormalization single-shot, hence branch-free and vectorizable). The
  encoder runs the schedule in reverse (rANS is LIFO) and the decoder reads
  the words straight through — word positions are implied by the lockstep
  schedule, so there is NO per-lane index in the stream.
- **Chained coding units**: the lane states THREAD across chunk dispatches
  (encode processes chunks in reverse order, decode forward, carrying
  (states, word-pointer) device-resident), so a whole multi-chunk workload
  is ONE coding unit with a single `4*L`-byte state flush — per-cube
  flushes would triple the stream at trained-model rates. Because the
  element->(step, lane) mapping is global and the carry is exact, decode
  may use ANY chunk partitioning of the element sequence (each dispatch a
  multiple of L elements). A full decode must end with every lane back at
  RANS_L — a free integrity check on the stream.

Stream layout per workload: `L` little-endian uint32 final encoder states,
then the data words (uint16 LE) in ascending (step, lane) order.

Rate overhead vs. the host range coder: one 4-byte-per-lane state flush per
workload plus the CDF quantization floor. Wire cost: only the compressed
words cross the PCIe/host link; the per-element prior never leaves the
device.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

PRECISION = 16
TOTAL = 1 << PRECISION          # CDF denominator
RANS_L = jnp.uint32(1 << 16)    # lower bound of the state interval
N_SYMBOLS = 256                 # Laplace support: symbol s in [-128, 127]
DEFAULT_LANES = 1024            # total interleaved lanes per workload
# scan-body unroll: the per-step work is a few lane-wide vector ops, so
# loop overhead dominates a thousands-step scan; unrolling batches it
# without changing the coded stream (sequential semantics preserved)
SCAN_UNROLL = int(os.environ.get("PCGC_RANS_UNROLL", "8"))

# log2(e) * 2^20 * 2^(-qf/8), qf in [0,8) — folds the fractional octave of
# the scale code into the Q20 multiplier (v = |8d| * M >> (3 + qi) is then
# |d|/scale * log2(e) in fixed point). Selected with a where-tree, not a
# gather: dynamic gathers serialize on the TPU VPU and dominated the scan
# cost in the first implementation.
_M_TABLE = np.round(
    np.log2(np.e) * (2.0 ** 20) * 2.0 ** (-np.arange(8) / 8.0)
).astype(np.uint32)

# Integer cubic for the exp2 fraction: w(f8) = 65536 - (f8*(C1 - f8*(C2 -
# f8*C3 >> 8) >> 8) >> 8) approximates 2^16 * 2^(-f8/256) within +-5,
# monotone non-increasing, and w(255) = 32858 > 2^15 so 2^-v stays monotone
# across integer-exponent boundaries. These constants DEFINE the stream
# format (they are the code table); do not retune without a format bump.
_EXP2_C1 = 45330
_EXP2_C2 = 15155
_EXP2_C3 = 2593


def _exp2_frac_q16(f8):
    """2^16 * 2^(-f8/256) for f8 in [0,256), pure uint32 VPU arithmetic."""
    f8 = f8.astype(jnp.uint32)
    q = (jnp.uint32(_EXP2_C3) * f8) >> 8
    q = ((jnp.uint32(_EXP2_C2) - q) * f8) >> 8
    q = ((jnp.uint32(_EXP2_C1) - q) * f8) >> 8
    return jnp.uint32(65536) - q


def _m_q20(qf):
    """_M_TABLE[qf] as a 3-level select tree (no gather)."""
    m = _M_TABLE
    b0 = (qf & 1).astype(bool)
    m01 = jnp.where(b0, jnp.uint32(m[1]), jnp.uint32(m[0]))
    m23 = jnp.where(b0, jnp.uint32(m[3]), jnp.uint32(m[2]))
    m45 = jnp.where(b0, jnp.uint32(m[5]), jnp.uint32(m[4]))
    m67 = jnp.where(b0, jnp.uint32(m[7]), jnp.uint32(m[6]))
    b1 = (qf & 2).astype(bool)
    lo = jnp.where(b1, m23, m01)
    hi = jnp.where(b1, m67, m45)
    return jnp.where((qf & 4).astype(bool), hi, lo)


def _laplace_cdf_q16(u, loc_q, scale_q):
    """Laplace CDF in Q16 at the left boundary of symbol u (= s + 128).

    Boundary b = (u - 128) - 1/2; loc = loc_q / 8; scale = 2^(scale_q/8-20).
    Pure int32/uint32 arithmetic; exact on every backend.
    """
    td = 8 * (u - 128) - 4 - loc_q          # int32: 8 * (b - loc)
    neg = td < 0
    a = jnp.abs(td).astype(jnp.uint32)      # <= 1155
    qi = (scale_q >> 3).astype(jnp.uint32)  # integer octaves
    qf = scale_q & 7
    v = a * _m_q20(qf)                       # < 2^31
    sh = qi + 3                              # binary point of v
    vi = jnp.where(sh <= 31, v >> jnp.minimum(sh, jnp.uint32(31)), 0)
    rs = jnp.clip(sh.astype(jnp.int32) - 8, 0, 31).astype(jnp.uint32)
    ls = jnp.clip(8 - sh.astype(jnp.int32), 0, 8).astype(jnp.uint32)
    f8 = jnp.where(sh >= 8, (v >> rs) & 255, (v << ls) & 255)
    w = jnp.where(vi <= 30,
                  _exp2_frac_q16(f8) >> jnp.minimum(vi, jnp.uint32(30)),
                  0)                          # 2^16 * e^(-|d|/scale)
    half = w >> 1
    return jnp.where(neg, half, jnp.uint32(TOTAL) - half)


def qcdf(u, loc_q, scale_q):
    """Quantized Laplace CDF: uint32 in [0, 65536], strictly increasing.

    qcdf(0) = 0, qcdf(256) = 65536, every symbol frequency >= 1 (the
    (TOTAL - N_SYMBOLS) rescale plus the +u ramp).
    """
    uc = jnp.clip(u, 0, N_SYMBOLS)
    f16 = _laplace_cdf_q16(uc, loc_q, scale_q)
    g = ((f16 * jnp.uint32(TOTAL - N_SYMBOLS)) >> PRECISION) \
        + uc.astype(jnp.uint32)
    g = jnp.where(uc <= 0, jnp.uint32(0), g)
    return jnp.where(uc >= N_SYMBOLS, jnp.uint32(TOTAL), g)


def pick_lanes(elems_per_cube, max_lanes=DEFAULT_LANES):
    """Total lane count: largest power of two <= max_lanes dividing the
    per-cube element count (so every chunk's element count divides too)."""
    lanes = 1
    while lanes * 2 <= max_lanes and elems_per_cube % (lanes * 2) == 0:
        lanes *= 2
    return lanes


# ------------------------- CDF models for the scan --------------------------
# A model supplies:
#   enc(u, *step_inputs)  -> (c, f): CDF at u and frequency of u (uint32)
#   dec(dv, *step_inputs) -> (u, c, f): symbol containing cumulative dv
# step_inputs are [L]-shaped slices scanned over [T, L] arrays.


def _laplace_enc(u, lq, sq):
    c = qcdf(u, lq, sq)
    f = qcdf(u + 1, lq, sq) - c
    return c, f


def _laplace_dec_fn(base=None, span_bits=8):
    """Laplace symbol search: branch-free bisection, by default over all
    256 bins. When the caller knows the coded symbols live in
    [base, base + 2^span_bits) (global range side info in the stream), the
    bisection shrinks to span_bits evals — the dominant cost of the decode
    scan. Each eval is pure VPU arithmetic, no gathers.

    base may be a TRACED scalar (it varies per stream; only span_bits — the
    loop length — must be static, so jit programs are keyed on 9 possible
    bit counts, not on every distinct latent range)."""

    def dec(dv, lq, sq):
        if base is None:
            lo = jnp.zeros(dv.shape, jnp.int32)
        else:
            lo = jnp.broadcast_to(jnp.asarray(base, jnp.int32), dv.shape)
        for i in range(span_bits - 1, -1, -1):
            mid = lo + (1 << i)
            lo = jnp.where(qcdf(mid, lq, sq) <= dv, mid, lo)
        c = qcdf(lo, lq, sq)
        f = qcdf(lo + 1, lq, sq) - c
        return lo, c, f

    return dec


_laplace_dec = _laplace_dec_fn()


def _table_model(table):
    """Per-lane CDF table rows: uint32 [L, N+1], t[:,0] = 0, t[:,N] = TOTAL,
    strictly increasing. Lookups are masked sums over the (static) symbol
    axis — no gathers, fully lane-vectorized."""
    table = jnp.asarray(table, jnp.uint32)
    n = table.shape[1] - 1
    js = jnp.arange(n, dtype=jnp.int32)                      # [N]

    def enc(u, *_):
        eq = (js[None, :] == u[:, None])                     # [L, N]
        c = jnp.where(eq, table[:, :n], 0).sum(axis=1)
        cn = jnp.where(eq, table[:, 1:], 0).sum(axis=1)
        return c, cn - c

    def dec(dv, *_):
        # largest u with t[u] <= dv  (t[0] = 0 <= dv always)
        u = (table[:, 1:n] <= dv[:, None]).sum(
            axis=1, dtype=jnp.int32) if n > 1 else \
            jnp.zeros(dv.shape, jnp.int32)
        c, f = enc(u)
        return u, c, f

    return enc, dec


# ------------------------------ chained scans --------------------------------

def _encode_scan(u_ts, step_inputs, enc_fn, states, cap):
    """Reverse-scan encode of [T, L] symbols; returns (words, count, states).

    states: uint32 [L] carry-in (the NEXT chunk's carry-out, since encode
    runs chunks in reverse). words: uint16 [cap] in ascending (step, lane)
    order; count: true word total (caller re-runs with larger cap if
    count > cap — the excess words were dropped, counts stay exact).
    """
    t, lanes = u_ts.shape

    def step(x, inp):
        uu, rest = inp[0], inp[1:]
        c, f = enc_fn(uu, *rest)
        flag = x >= (f << PRECISION)          # emit exactly 0 or 1 word
        word = (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        x1 = jnp.where(flag, x >> 16, x)
        q = x1 // f
        x2 = (q << PRECISION) + (x1 - q * f) + c
        return x2, (word, flag)

    states, (words, flags) = jax.lax.scan(
        step, states, (u_ts,) + step_inputs, reverse=True,
        unroll=SCAN_UNROLL)
    wf = words.reshape(t * lanes)
    ff = flags.reshape(t * lanes)
    pos = jnp.cumsum(ff) - ff.astype(jnp.int32)
    idx = jnp.where(ff, pos, cap)
    out = jnp.zeros((cap + 1,), jnp.uint16)
    out = out.at[idx].set(wf, mode="drop")[:cap]
    count = ff.sum(dtype=jnp.int32)
    return out, count, states


def _decode_scan(words, states, ptr, step_inputs, dec_fn, t):
    """Forward-scan decode of t steps; returns (u [T, L], states, ptr).

    words: the WHOLE workload's word array (uint16 [W]); ptr: scalar int32
    position of the next unread word (carried across chunk dispatches).
    """
    capd = words.shape[0]

    def step(carry, inp):
        x, p = carry
        dv = x & jnp.uint32(0xFFFF)
        u, c, f = dec_fn(dv, *inp)
        x1 = f * (x >> PRECISION) + dv - c
        flag = x1 < RANS_L                    # read exactly 0 or 1 word
        off = jnp.cumsum(flag) - flag.astype(jnp.int32)
        idx = jnp.minimum(p + off, capd - 1)
        w = jnp.take(words, idx).astype(jnp.uint32)
        x2 = jnp.where(flag, (x1 << 16) | w, x1)
        return (x2, p + flag.sum(dtype=jnp.int32)), u

    (states, ptr), us = jax.lax.scan(step, (states, ptr), step_inputs,
                                     length=t, unroll=SCAN_UNROLL)
    return us, states, ptr


def _ts(arr, lanes):
    """Flat [M] -> [T, L]: element e = step * L + lane (round-robin)."""
    m = arr.shape[0]
    return arr.reshape(m // lanes, lanes)


# ------------------------------- public API ---------------------------------

def rans_encode(symbols_u, loc_q, scale_q, states, cap):
    """Chained Laplace-prior encode of one chunk.

    Args:
      symbols_u / loc_q / scale_q: int32 [M] (M % L == 0); symbols + 128.
      states: uint32 [L] carry (RANS_L-filled for the LAST chunk; encode
        feeds chunks in reverse order).
      cap: static word-buffer capacity.

    Returns (words uint16 [cap], count int32, states uint32 [L]).
    """
    lanes = states.shape[0]
    return _encode_scan(
        _ts(symbols_u.astype(jnp.int32), lanes),
        (_ts(loc_q.astype(jnp.int32), lanes),
         _ts(scale_q.astype(jnp.int32), lanes)),
        _laplace_enc, states, cap)


def rans_decode(words, states, ptr, loc_q, scale_q, base=None,
                span_bits=8):
    """Chained Laplace-prior decode of one chunk.

    words: uint16 [W] (whole workload); states/ptr: carry-in; loc_q/scale_q:
    int32 [M] prior codes (identical to encode side). base/span_bits:
    optional static symbol-range restriction (all coded symbols + 128 must
    lie in [base, base + 2^span_bits)); cuts the bisection cost. Returns
    (symbols_u int32 [M], states, ptr).
    """
    lanes = states.shape[0]
    lt = _ts(loc_q.astype(jnp.int32), lanes)
    st = _ts(scale_q.astype(jnp.int32), lanes)
    us, states, ptr = _decode_scan(words, states, ptr, (lt, st),
                                   _laplace_dec_fn(base, span_bits),
                                   lt.shape[0])
    return us.reshape(-1), states, ptr


def rans_encode_cdf(symbols, table, states, cap):
    """Chained table-CDF encode: symbols int32 [M] in [0, N), table uint32
    [L, N+1] per-lane rows. Returns (words, count, states)."""
    lanes = states.shape[0]
    enc, _ = _table_model(table)
    return _encode_scan(_ts(symbols.astype(jnp.int32), lanes), (),
                        enc, states, cap)


def rans_decode_cdf(words, table, states, ptr, m):
    """Chained table-CDF decode of m symbols (static). Returns
    (symbols int32 [m], states, ptr)."""
    lanes = states.shape[0]
    _, dec = _table_model(table)
    us, states, ptr = _decode_scan(words, states, ptr, (),
                                   dec, m // lanes)
    return us.reshape(-1), states, ptr


def initial_states(lanes):
    return jnp.full((lanes,), RANS_L, jnp.uint32)


# ------------------------- mask-wire nibble coding ---------------------------
# Decode-side transport compression for the classified occupancy masks: the
# bit-packed masks are decompression's largest device->host transfer
# (1 bit/voxel = cs^3/8 bytes per cube; ~4.7 MB per vox10 workload,
# PERF_NOTES.md link profile). Entropy-coding the packed bytes on device
# before download shrinks the wire ~10-25x at trained-model densities.
# This is D2H transport INSIDE decompression only — it never touches the
# bitstream container format.
#
# Model: a 16-symbol (nibble) alphabet with a per-chunk empirical histogram
# — N=16 keeps the gather-free table lookups cheap on the VPU (16 masked
# sums per scan step instead of 256). Each chunk is its own coding unit
# (masks are produced forward during decode, and rANS is LIFO, so units
# cannot chain across chunks). The host decoder is C++
# (native pcgc_rans_mask_decode); it rebuilds the CDF from the downloaded
# scaled histogram with the SAME integer algorithm as cdf16_from_hist.

MASK_SYMS = 16


def _mask_nibbles(packed_bytes):
    """uint8 [M] -> int32 [2M] nibbles, high nibble first (the bit order
    np.unpackbits uses on the packed masks)."""
    b = packed_bytes.astype(jnp.int32).reshape(-1)
    return jnp.stack([b >> 4, b & 15], axis=-1).reshape(-1)


def scaled_hist16(nibs):
    """16-bin histogram, scaled so the total stays below 2^15 (keeps the
    cdf16_from_hist products inside int32 on any backend) while every
    occurring symbol keeps a nonzero count. The SCALED histogram is what
    ships to the host — the decoder never rescales."""
    h = jnp.sum((nibs[:, None] == jnp.arange(MASK_SYMS)[None, :]),
                axis=0, dtype=jnp.int32)
    m = jnp.maximum(h.sum(), 1)
    s = jnp.maximum(
        jnp.ceil(jnp.log2(m.astype(jnp.float32))).astype(jnp.int32) - 14, 0)
    return jnp.maximum(h >> s, (h > 0).astype(jnp.int32))


def cdf16_from_hist(hist):
    """Quantized CDF (denominator TOTAL) from a scaled 16-bin histogram.

    Pure integer and deterministic: floor-scale with +1 for occurring
    symbols, dump the remainder on the first-most-frequent bin, and clamp
    the degenerate single-symbol case to TOTAL-1 (f = TOTAL would overflow
    the encoder's uint32 f << 16 renormalization test). MIRRORED in C++
    (pcgc_native.cc Cdf16FromHist) — keep the two in lockstep; any
    divergence corrupts mask decode.
    """
    h = hist.astype(jnp.int32)
    m = jnp.maximum(h.sum(), 1)
    nnz = (h > 0).sum()
    f = (h * (TOTAL - nnz)) // m + (h > 0)
    f = f.at[jnp.argmax(h)].add(TOTAL - f.sum())
    f = jnp.minimum(f, TOTAL - 1)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.uint32),
         jnp.cumsum(f).astype(jnp.uint32)])


def mask_lanes(n_bytes, max_lanes=4 * DEFAULT_LANES):
    """Lane count for a mask unit, scaled to the unit size: the 4 B/lane
    state flush must stay a small fraction of the packed bytes (the mask
    unit is decode-side TRANSPORT, so flush costs wire but no bpp), and
    wider interleave cuts the maskenc scan's serial steps. lanes <=
    n_bytes/256 keeps the flush under ~1.6% of the packed size: a
    96-cube 64^3 chunk (3.1 MB) gets 4096 lanes (4x fewer steps than
    the old 1024 cap), an 8-cube chunk gets 1024, tiny test units stay
    narrow."""
    by_size = 1 << max(int(np.floor(np.log2(max(n_bytes // 256, 1)))), 4)
    return pick_lanes(2 * n_bytes, min(max_lanes, by_size))


def mask_encode(packed_bytes, states, cap):
    """Encode one chunk's packed mask bytes as one nibble rANS unit.

    Returns (words uint16 [cap], count int32, states uint32 [L],
    hist int32 [16]); download words[:count] + the three small arrays.
    states must be initial_states(L) with L dividing 2*len(packed_bytes).
    """
    nib = _mask_nibbles(packed_bytes)
    hist = scaled_hist16(nib)
    cdf = cdf16_from_hist(hist)
    lanes = states.shape[0]
    table = jnp.broadcast_to(cdf[None, :], (lanes, MASK_SYMS + 1))
    enc, _ = _table_model(table)
    words, count, states = _encode_scan(_ts(nib, lanes), (), enc, states,
                                        cap)
    return words, count, states, hist


def mask_decode_np(words, states, hist, n_bytes, lanes):
    """Reference/fallback host decoder (numpy; the production path is the
    C++ pcgc_rans_mask_decode). Vectorized across lanes, sequential in
    scan steps — mirrors _decode_scan exactly."""
    cdf = np.asarray(jax.device_get(cdf16_from_hist(jnp.asarray(hist))),
                     np.uint64)
    freq = cdf[1:] - cdf[:-1]
    lut = np.zeros(TOTAL, np.uint8)
    for s in range(MASK_SYMS):
        lut[int(cdf[s]):int(cdf[s + 1])] = s
    x = np.asarray(states, np.uint64).copy()
    words = np.asarray(words, np.uint64)
    n_nib = 2 * n_bytes
    t = n_nib // lanes
    out = np.empty((t, lanes), np.uint8)
    p = 0
    for step in range(t):
        dv = x & 0xFFFF
        u = lut[dv.astype(np.int64)]
        out[step] = u
        x = freq[u] * (x >> 16) + dv - cdf[:-1][u]
        need = x < (1 << 16)
        k = int(need.sum())
        if k:
            if p + k > len(words):
                raise ValueError("mask stream truncated")
            x[need] = (x[need] << np.uint64(16)) | words[p:p + k]
            p += k
    if not (x == (1 << 16)).all():
        raise ValueError("mask stream integrity check failed")
    nib = out.reshape(-1)
    return ((nib[0::2] << 4) | nib[1::2]).astype(np.uint8)


def check_final_states(states):
    """A fully-consumed stream leaves every lane at RANS_L; anything else
    means corruption or a mismatched prior. Host-side, cheap."""
    states = np.asarray(states)
    if not (states == np.uint32(1 << 16)).all():
        raise ValueError(
            "rANS stream integrity check failed: lane states did not "
            "return to RANS_L after full decode (corrupt stream, wrong "
            "prior, or mismatched coder configuration)")


# ------------------------- host-side stream framing -------------------------

def pack_stream(word_segments, counts, states):
    """Workload blob: L x uint32-LE final states, then the word segments
    (chunk order, each truncated to its true count) as uint16-LE. Raises on
    capacity overflow (caller retries with a larger cap)."""
    states = np.asarray(states)
    out = [states.astype("<u4").tobytes()]
    for words, count in zip(word_segments, counts):
        words = np.asarray(words)
        if count > words.shape[0]:
            raise OverflowError(
                f"rANS word buffer overflow ({count} > cap "
                f"{words.shape[0]})")
        out.append(words[:count].astype("<u2").tobytes())
    return b"".join(out)


def unpack_stream(blob, lanes):
    """Inverse of pack_stream -> (words uint16 [W], states uint32 [L])."""
    head = 4 * lanes
    states = np.frombuffer(blob[:head], "<u4")
    words = np.frombuffer(blob[head:], "<u2")
    return words, states


@functools.partial(jax.jit, static_argnames=("cap",))
def rans_encode_jit(symbols_u, loc_q, scale_q, states, cap):
    return rans_encode(symbols_u, loc_q, scale_q, states, cap)


@functools.partial(jax.jit)
def rans_decode_jit(words, states, ptr, loc_q, scale_q):
    return rans_decode(words, states, ptr, loc_q, scale_q)
