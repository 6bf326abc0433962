"""On-device interleaved rANS entropy coder (pure JAX, integer-exact).

TPU-native replacement for host-side range coding of the hyper-mode latents.
The reference codes `y` on the CPU with TF's C++ range coder fed by float
Laplace CDFs computed on the accelerator (conditional_entropy_model.py:95-201
in NJUVISION/PCGCv1) — every encode AND decode must ship per-voxel float
(loc, scale) across the device/host boundary, and float non-determinism
between the encoder's and decoder's CDF evaluation is the reference's known
decode-mismatch bug (its README.md:111-114).

This module instead runs the entire entropy-coding loop on the accelerator:

- **Quantized Laplace CDFs in pure integer arithmetic** (`qcdf`): the prior
  arrives as transport codes (loc_q = round(8*loc) int8, scale_q =
  round(8*(log2(scale)+20)) uint8, the same grid as the C++ host coder) and
  the CDF at every symbol boundary is evaluated with int32/uint32 ops plus
  two small lookup tables — bit-exact on any backend by construction, so the
  encoder and decoder see identical code tables even across differently
  fused XLA programs.
- **Interleaved rANS** (Duda's asymmetric numeral system, Giesen's
  interleaving): L independent 32-bit lane states per cube share one word
  stream. Each lane codes a contiguous block of symbols; all lanes advance
  in lockstep, one symbol per `lax.scan` step, emitting/consuming at most
  one uint16 word per step (precision 16 makes the renormalization
  single-shot, hence branch-free and vectorizable). The encoder runs the
  schedule in reverse (rANS is LIFO) and the decoder reads the words
  straight through — word positions are implied by the lockstep schedule,
  so there is NO per-lane index in the stream.

Stream layout per cube: `lanes` little-endian uint32 final encoder states,
then the data words (uint16 LE) in (step, lane) ascending order.

Rate overhead vs. the host range coder: 4 bytes/lane state flush plus the
CDF quantization (1/65536-floor per symbol over a fixed [-128,127] support
— no per-cube min/max side info needed, unlike the reference's format).
Wire cost: only the compressed words cross the PCIe/host link; the
per-element prior never leaves the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PRECISION = 16
TOTAL = 1 << PRECISION          # CDF denominator
RANS_L = jnp.uint32(1 << 16)    # lower bound of the state interval
N_SYMBOLS = 256                 # fixed support: symbol s in [-128, 127]
DEFAULT_LANES = 32

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
    """Quantized CDF: uint32 in [0, 65536], strictly increasing in u.

    qcdf(0) = 0, qcdf(256) = 65536, every symbol frequency >= 1 (the
    (TOTAL - N_SYMBOLS) rescale plus the +u ramp).
    """
    uc = jnp.clip(u, 0, N_SYMBOLS)
    f16 = _laplace_cdf_q16(uc, loc_q, scale_q)
    g = ((f16 * jnp.uint32(TOTAL - N_SYMBOLS)) >> PRECISION) \
        + uc.astype(jnp.uint32)
    g = jnp.where(uc <= 0, jnp.uint32(0), g)
    return jnp.where(uc >= N_SYMBOLS, jnp.uint32(TOTAL), g)


def _to_lanes(arr, lanes):
    """[B, E] -> [T, B, lanes]; lane l codes elements [l*T, (l+1)*T)."""
    b, e = arr.shape
    t = e // lanes
    return jnp.transpose(arr.reshape(b, lanes, t), (2, 0, 1))


def rans_encode(symbols_u, loc_q, scale_q, lanes=DEFAULT_LANES, cap=None):
    """Encode per-element-Laplace symbols on device.

    Args:
      symbols_u: int32 [B, E] symbols + 128 (in [0, 256)). E % lanes == 0.
      loc_q: int32 [B, E] location codes (int8 range).
      scale_q: int32 [B, E] scale codes (uint8 range).
      lanes: interleaved rANS lanes per cube.
      cap: static word-buffer capacity per cube (default E // 8). If a
        cube's stream exceeds cap, its count is still exact but the excess
        words are dropped — callers must check counts <= cap and re-run
        with a larger cap (worst case E // lanes words per lane = E total).

    Returns:
      words: uint16 [B, cap] compacted stream words (ascending step, lane).
      counts: int32 [B] true word counts (may exceed cap on overflow).
      states: uint32 [B, lanes] final encoder states (decoder initials).
    """
    b, e = symbols_u.shape
    if cap is None:
        cap = e // 8
    ut = _to_lanes(symbols_u.astype(jnp.int32), lanes)
    lt = _to_lanes(loc_q.astype(jnp.int32), lanes)
    st = _to_lanes(scale_q.astype(jnp.int32), lanes)

    def step(x, inp):
        uu, ll, ss = inp
        c = qcdf(uu, ll, ss)
        f = qcdf(uu + 1, ll, ss) - c
        flag = x >= (f << PRECISION)          # emit exactly 0 or 1 word
        word = (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        x1 = jnp.where(flag, x >> 16, x)
        q = x1 // f
        x2 = (q << PRECISION) + (x1 - q * f) + c
        return x2, (word, flag)

    # rANS is LIFO: encode the schedule in reverse so decode reads forward.
    x0 = jnp.full((b, lanes), RANS_L, jnp.uint32)
    states, (words, flags) = jax.lax.scan(step, x0, (ut, lt, st),
                                          reverse=True)

    # compact to per-cube streams in (step, lane) ascending order
    wf = jnp.transpose(words, (1, 0, 2)).reshape(b, e)
    ff = jnp.transpose(flags, (1, 0, 2)).reshape(b, e)
    pos = jnp.cumsum(ff, axis=1) - ff.astype(jnp.int32)
    idx = jnp.where(ff, pos, cap)
    out = jnp.zeros((b, cap + 1), jnp.uint16)
    out = out.at[jnp.arange(b)[:, None], idx].set(wf, mode="drop")[:, :cap]
    counts = ff.sum(axis=1).astype(jnp.int32)
    return out, counts, states


def rans_decode(words, states, loc_q, scale_q, lanes=DEFAULT_LANES):
    """Decode symbols coded by :func:`rans_encode`.

    Args:
      words: uint16 [B, capd] per-cube stream words (zero-padded).
      states: uint32 [B, lanes] initial lane states from the stream head.
      loc_q / scale_q: int32 [B, E] prior codes (identical to encode side —
        produced by the shared "prior" program, never leaving the device).

    Returns:
      symbols_u: int32 [B, E] decoded symbols + 128.
    """
    b, e = loc_q.shape
    capd = words.shape[1]
    lt = _to_lanes(loc_q.astype(jnp.int32), lanes)
    st = _to_lanes(scale_q.astype(jnp.int32), lanes)

    def step(carry, inp):
        x, ptr = carry
        ll, ss = inp
        dv = x & jnp.uint32(0xFFFF)
        # largest u with qcdf(u) <= dv: branch-free bisection over 256 bins
        # (each eval is pure VPU arithmetic — no gathers — so 10 evals per
        # symbol stay cheap)
        lo = jnp.zeros(x.shape, jnp.int32)
        for bit in (128, 64, 32, 16, 8, 4, 2, 1):
            mid = lo + bit
            lo = jnp.where(qcdf(mid, ll, ss) <= dv, mid, lo)
        c = qcdf(lo, ll, ss)
        f = qcdf(lo + 1, ll, ss) - c
        x1 = f * (x >> PRECISION) + dv - c
        flag = x1 < RANS_L                    # read exactly 0 or 1 word
        off = jnp.cumsum(flag, axis=1) - flag.astype(jnp.int32)
        idx = jnp.minimum(ptr[:, None] + off, capd - 1)
        w = jnp.take_along_axis(words, idx, axis=1).astype(jnp.uint32)
        x2 = jnp.where(flag, (x1 << 16) | w, x1)
        ptr2 = ptr + flag.sum(axis=1, dtype=jnp.int32)
        return (x2, ptr2), lo

    ptr0 = jnp.zeros((b,), jnp.int32)
    (_, _), us = jax.lax.scan(step, (states, ptr0), (lt, st))
    # us [T, B, lanes] -> [B, E] matching _to_lanes layout
    return jnp.transpose(us, (1, 2, 0)).reshape(b, e)


@functools.partial(jax.jit, static_argnames=("lanes", "cap"))
def rans_encode_jit(symbols_u, loc_q, scale_q, lanes, cap):
    return rans_encode(symbols_u, loc_q, scale_q, lanes, cap)


@functools.partial(jax.jit, static_argnames=("lanes",))
def rans_decode_jit(words, states, loc_q, scale_q, lanes):
    return rans_decode(words, states, loc_q, scale_q, lanes)


# ------------------------- host-side stream framing -------------------------

def pack_streams(words, counts, states):
    """Per-cube byte strings: lanes x uint32-LE states, then count uint16-LE
    words. Raises on capacity overflow (caller retries with a larger cap)."""
    words = np.asarray(words)
    counts = np.asarray(counts)
    states = np.asarray(states)
    if (counts > words.shape[1]).any():
        raise OverflowError(
            f"rANS word buffer overflow (max count {counts.max()} > cap "
            f"{words.shape[1]})")
    out = []
    for i in range(words.shape[0]):
        out.append(states[i].astype("<u4").tobytes()
                   + words[i, :counts[i]].astype("<u2").tobytes())
    return out


def unpack_streams(strings, lanes, capd):
    """Inverse of pack_streams: -> (words uint16 [B, capd], states [B, lanes])."""
    b = len(strings)
    words = np.zeros((b, capd), np.uint16)
    states = np.empty((b, lanes), np.uint32)
    head = 4 * lanes
    for i, s in enumerate(strings):
        states[i] = np.frombuffer(s[:head], "<u4")
        w = np.frombuffer(s[head:], "<u2")
        words[i, :len(w)] = w
    return words, states
