"""On-device interleaved rANS coder: exactness, monotonicity, rate.

The device coder replaces the reference's host-side range coding of y
(conditional_entropy_model.py:126-201) with integer-exact on-accelerator
coding; these tests pin down the properties the format depends on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pcgcv1_tpu.entropy import rans


def _np_qcdf(u, loc_q, sq):
    """Pure-numpy mirror of rans.qcdf (uint32 semantics)."""
    u = np.asarray(u, np.int64)
    loc_q = np.asarray(loc_q, np.int64)
    sq = np.asarray(sq, np.int64)
    uc = np.clip(u, 0, 256)
    td = 8 * (uc - 128) - 4 - loc_q
    a = np.abs(td).astype(np.uint64)
    qi = sq >> 3
    qf = sq & 7
    v = a * rans._M_TABLE[qf]
    sh = qi + 3
    rs = np.clip(sh - 8, 0, 31).astype(np.uint64)
    ls = np.clip(8 - sh, 0, 8).astype(np.uint64)
    vi = np.where(sh <= 31, v >> np.minimum(sh, 31).astype(np.uint64), 0)
    f8 = np.where(sh >= 8, (v >> rs) & 255, (v << ls) & 255)
    q = (rans._EXP2_C3 * f8) >> 8
    q = ((rans._EXP2_C2 - q) * f8) >> 8
    q = ((rans._EXP2_C1 - q) * f8) >> 8
    exp2 = 65536 - q
    w = np.where(vi <= 30, exp2 >> np.minimum(vi, 30), 0)
    half = w >> 1
    f16 = np.where(td < 0, half, 65536 - half)
    g = ((f16 * np.uint64(65536 - 256)) >> 16) + uc
    g = np.where(uc <= 0, 0, g)
    return np.where(uc >= 256, 65536, g).astype(np.uint32)


def test_qcdf_matches_numpy_mirror():
    rng = np.random.default_rng(0)
    u = rng.integers(0, 257, 20000).astype(np.int32)
    lq = rng.integers(-128, 128, 20000).astype(np.int32)
    sq = rng.integers(0, 256, 20000).astype(np.int32)
    got = np.asarray(rans.qcdf(jnp.asarray(u), jnp.asarray(lq),
                               jnp.asarray(sq)))
    assert np.array_equal(got, _np_qcdf(u, lq, sq))


def test_qcdf_monotone_freq_positive_exhaustive():
    """For every (loc_q, scale_q) on a dense grid, qcdf must be strictly
    increasing over u in [0,256] with endpoints 0 and 65536 — the coder's
    correctness (freq >= 1, total = 2^16) rests on this."""
    u = np.arange(257)
    for lq in range(-128, 128, 7):
        sqs = np.arange(0, 256)
        g = _np_qcdf(u[None, :], np.full((256, 1), lq), sqs[:, None])
        assert (g[:, 0] == 0).all() and (g[:, -1] == 65536).all()
        assert (np.diff(g.astype(np.int64), axis=1) >= 1).all(), lq


@pytest.mark.parametrize("lanes", [4, 16])
def test_roundtrip_exact(lanes):
    rng = np.random.default_rng(1)
    b, e = 5, 1024
    lq = rng.integers(-40, 40, (b, e)).astype(np.int32)
    sq = rng.integers(120, 200, (b, e)).astype(np.int32)
    # symbols concentrated near loc, with tails
    sym = np.clip(np.round(lq / 8.0 + rng.standard_t(3, (b, e)) * 2),
                  -128, 127).astype(np.int32)
    u = sym + 128
    words, counts, states = rans.rans_encode_jit(
        jnp.asarray(u), jnp.asarray(lq), jnp.asarray(sq), lanes, e)
    assert int(np.max(np.asarray(counts))) <= e
    dec = rans.rans_decode_jit(jnp.asarray(np.asarray(words)),
                               jnp.asarray(np.asarray(states)),
                               jnp.asarray(lq), jnp.asarray(sq), lanes)
    assert np.array_equal(np.asarray(dec), u)


def test_roundtrip_through_packed_strings():
    rng = np.random.default_rng(2)
    b, e, lanes = 3, 512, 8
    lq = rng.integers(-16, 16, (b, e)).astype(np.int32)
    sq = np.full((b, e), 150, np.int32)
    u = np.clip(rng.normal(128, 3, (b, e)).round(), 0, 255).astype(np.int32)
    words, counts, states = rans.rans_encode_jit(
        jnp.asarray(u), jnp.asarray(lq), jnp.asarray(sq), lanes, e)
    strings = rans.pack_streams(words, counts, states)
    capd = max(int(np.max(np.asarray(counts))), 1)
    w2, s2 = rans.unpack_streams(strings, lanes, capd)
    dec = rans.rans_decode_jit(jnp.asarray(w2), jnp.asarray(s2),
                               jnp.asarray(lq), jnp.asarray(sq), lanes)
    assert np.array_equal(np.asarray(dec), u)


def test_overflow_detection():
    rng = np.random.default_rng(3)
    b, e, lanes = 2, 256, 4
    # uniform symbols + tiny scale prior = maximally surprising -> overflow
    lq = np.zeros((b, e), np.int32)
    sq = np.zeros((b, e), np.int32)
    u = rng.integers(0, 256, (b, e)).astype(np.int32)
    words, counts, states = rans.rans_encode_jit(
        jnp.asarray(u), jnp.asarray(lq), jnp.asarray(sq), lanes, 16)
    assert int(np.max(np.asarray(counts))) > 16
    with pytest.raises(OverflowError):
        rans.pack_streams(words, counts, states)
    # retry at full capacity must round-trip
    words, counts, states = rans.rans_encode_jit(
        jnp.asarray(u), jnp.asarray(lq), jnp.asarray(sq), lanes, e)
    dec = rans.rans_decode_jit(jnp.asarray(np.asarray(words)),
                               jnp.asarray(np.asarray(states)),
                               jnp.asarray(lq), jnp.asarray(sq), lanes)
    assert np.array_equal(np.asarray(dec), u)


def test_rate_near_entropy():
    """Coded size must sit close to the analytic Laplace cross-entropy of
    the quantized model (within quantization slack + lane flush)."""
    rng = np.random.default_rng(4)
    b, e, lanes = 4, 4096, 16
    loc = rng.uniform(-2, 2, (b, e))
    scale = np.exp(rng.uniform(np.log(0.3), np.log(2.0), (b, e)))
    lq = np.clip(np.round(loc * 8), -127, 127).astype(np.int32)
    sq = np.clip(np.round((np.log2(scale) + 20) * 8), 0, 255).astype(np.int32)
    sym = np.round(loc + np.random.default_rng(5).laplace(
        0, scale)).clip(-128, 127).astype(np.int32)
    u = sym + 128
    words, counts, states = rans.rans_encode_jit(
        jnp.asarray(u), jnp.asarray(lq), jnp.asarray(sq), lanes, e)
    coded_bits = (np.asarray(counts).sum() * 16 + b * lanes * 32)
    # analytic bits under the quantized CDF tables themselves
    g_hi = _np_qcdf(u + 1, lq, sq).astype(np.float64)
    g_lo = _np_qcdf(u, lq, sq).astype(np.float64)
    ideal_bits = -np.log2((g_hi - g_lo) / 65536.0).sum()
    assert coded_bits < ideal_bits * 1.02 + b * lanes * 32 + 64
    # and decodes exactly
    dec = rans.rans_decode_jit(jnp.asarray(np.asarray(words)),
                               jnp.asarray(np.asarray(states)),
                               jnp.asarray(lq), jnp.asarray(sq), lanes)
    assert np.array_equal(np.asarray(dec), u)
