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


def _laplace_data(rng, m, spread=3):
    lq = rng.integers(-40, 40, m).astype(np.int32)
    sq = rng.integers(120, 200, m).astype(np.int32)
    sym = np.clip(np.round(lq / 8.0 + rng.standard_t(3, m) * spread),
                  -128, 127).astype(np.int32)
    return sym + 128, lq, sq


def _encode_chunks(u, lq, sq, lanes, bounds, cap):
    """Chained encode over [start, end) element ranges (reverse order)."""
    states = rans.initial_states(lanes)
    segs = []
    for s, e in reversed(bounds):
        words, count, states = rans.rans_encode(
            jnp.asarray(u[s:e]), jnp.asarray(lq[s:e]), jnp.asarray(sq[s:e]),
            states, cap)
        c = int(np.asarray(count))
        assert c <= cap
        segs.append((np.asarray(words), c))
    segs.reverse()
    return rans.pack_stream([w for w, _ in segs], [c for _, c in segs],
                            np.asarray(states))


def _decode_chunks(blob, lq, sq, lanes, bounds):
    words, states = rans.unpack_stream(blob, lanes)
    wdev = jnp.asarray(np.concatenate([words, np.zeros(8, np.uint16)]))
    states = jnp.asarray(states)
    ptr = jnp.int32(0)
    out = []
    for s, e in bounds:
        u, states, ptr = rans.rans_decode(
            wdev, states, ptr, jnp.asarray(lq[s:e]), jnp.asarray(sq[s:e]))
        out.append(np.asarray(u))
    rans.check_final_states(states)
    return np.concatenate(out)


@pytest.mark.parametrize("lanes", [4, 16])
def test_roundtrip_exact_single_unit(lanes):
    rng = np.random.default_rng(1)
    m = 4096
    u, lq, sq = _laplace_data(rng, m)
    blob = _encode_chunks(u, lq, sq, lanes, [(0, m)], m)
    dec = _decode_chunks(blob, lq, sq, lanes, [(0, m)])
    assert np.array_equal(dec, u)


def test_chained_chunks_and_chunk_free_decode():
    """States/ptr thread across chunk dispatches, and decode may use ANY
    chunk partitioning of the element sequence (multiples of L)."""
    rng = np.random.default_rng(2)
    lanes, m = 8, 6144
    u, lq, sq = _laplace_data(rng, m)
    enc_bounds = [(0, 2048), (2048, 4096), (4096, 6144)]
    blob = _encode_chunks(u, lq, sq, lanes, enc_bounds, 2048)
    # same chunking
    dec = _decode_chunks(blob, lq, sq, lanes, enc_bounds)
    assert np.array_equal(dec, u)
    # different chunking (one shot, and uneven pieces)
    dec2 = _decode_chunks(blob, lq, sq, lanes, [(0, m)])
    assert np.array_equal(dec2, u)
    dec3 = _decode_chunks(blob, lq, sq, lanes,
                          [(0, 512), (512, 4608), (4608, 6144)])
    assert np.array_equal(dec3, u)


def test_single_state_flush_per_workload():
    """The whole point of chaining: stream overhead is one 4L-byte flush
    per workload, not per cube/chunk."""
    rng = np.random.default_rng(3)
    lanes, m = 16, 8192
    u, lq, sq = _laplace_data(rng, m)
    one = _encode_chunks(u, lq, sq, lanes, [(0, m)], m)
    four = _encode_chunks(u, lq, sq, lanes,
                          [(i * 2048, (i + 1) * 2048) for i in range(4)], m)
    assert len(four) == len(one)  # identical size AND content layout
    assert np.frombuffer(one[:4 * lanes], "<u4").shape == (lanes,)


def test_integrity_check_rejects_corruption():
    rng = np.random.default_rng(4)
    lanes, m = 8, 2048
    u, lq, sq = _laplace_data(rng, m)
    blob = _encode_chunks(u, lq, sq, lanes, [(0, m)], m)
    bad = bytearray(blob)
    bad[4 * lanes + 7] ^= 0x40  # flip a bit in the words
    with pytest.raises(ValueError):
        _decode_chunks(bytes(bad), lq, sq, lanes, [(0, m)])


def test_overflow_detection_and_retry():
    rng = np.random.default_rng(5)
    lanes, m = 4, 1024
    lq = np.zeros(m, np.int32)
    sq = np.zeros(m, np.int32)  # tiny scale: uniform symbols are surprising
    u = rng.integers(0, 256, m).astype(np.int32)
    states = rans.initial_states(lanes)
    words, count, states_out = rans.rans_encode(
        jnp.asarray(u), jnp.asarray(lq), jnp.asarray(sq), states, 64)
    assert int(np.asarray(count)) > 64
    with pytest.raises(OverflowError):
        rans.pack_stream([np.asarray(words)], [int(np.asarray(count))],
                         np.asarray(states_out))
    # retry at full capacity from the SAME carry-in: states must agree
    words2, count2, states2 = rans.rans_encode(
        jnp.asarray(u), jnp.asarray(lq), jnp.asarray(sq), states, m)
    assert np.array_equal(np.asarray(states_out), np.asarray(states2))
    blob = rans.pack_stream([np.asarray(words2)], [int(np.asarray(count2))],
                            np.asarray(states2))
    dec = _decode_chunks(blob, lq, sq, lanes, [(0, m)])
    assert np.array_equal(dec, u)


def test_rate_near_entropy():
    """Coded size must sit close to the analytic cross-entropy of the
    quantized model (single lane-state flush per workload)."""
    rng = np.random.default_rng(6)
    lanes, m = 16, 16384
    loc = rng.uniform(-2, 2, m)
    scale = np.exp(rng.uniform(np.log(0.3), np.log(2.0), m))
    lq = np.clip(np.round(loc * 8), -127, 127).astype(np.int32)
    sq = np.clip(np.round((np.log2(scale) + 20) * 8), 0, 255).astype(np.int32)
    sym = np.round(loc + np.random.default_rng(7).laplace(
        0, scale)).clip(-128, 127).astype(np.int32)
    u = sym + 128
    blob = _encode_chunks(u, lq, sq, lanes, [(0, m)], m)
    coded_bits = len(blob) * 8
    g_hi = _np_qcdf(u + 1, lq, sq).astype(np.float64)
    g_lo = _np_qcdf(u, lq, sq).astype(np.float64)
    ideal_bits = -np.log2((g_hi - g_lo) / 65536.0).sum()
    assert coded_bits < ideal_bits * 1.02 + lanes * 32 + 64
    dec = _decode_chunks(blob, lq, sq, lanes, [(0, m)])
    assert np.array_equal(dec, u)


# ------------------------------ table-CDF model ------------------------------

def _mk_tables(rng, c, n):
    """Random valid per-channel quantized CDFs [C, N+1]."""
    freqs = rng.integers(1, 5000, (c, n)).astype(np.uint64)
    t = np.zeros((c, n + 1), np.uint64)
    t[:, 1:] = np.cumsum(freqs, axis=1)
    # rescale to TOTAL with min-freq 1 (same construction as the C++)
    avail = 65536 - n
    out = np.zeros((c, n + 1), np.uint32)
    for j in range(1, n):
        out[:, j] = (t[:, j] * avail // t[:, n]).astype(np.uint32) + j
    out[:, n] = 65536
    return out


@pytest.mark.parametrize("c,n", [(4, 8), (8, 31)])
def test_table_cdf_roundtrip(c, n):
    rng = np.random.default_rng(8)
    lanes, m = 16, 4096  # lanes % c == 0 -> fixed channel per lane
    table = _mk_tables(rng, c, n)
    trows = jnp.asarray(table[np.arange(lanes) % c])
    sym = rng.integers(0, n, m).astype(np.int32)
    states = rans.initial_states(lanes)
    words, count, states = rans.rans_encode_cdf(
        jnp.asarray(sym), trows, states, m)
    blob = rans.pack_stream([np.asarray(words)], [int(np.asarray(count))],
                            np.asarray(states))
    w2, s2 = rans.unpack_stream(blob, lanes)
    dec, s_end, _ = rans.rans_decode_cdf(
        jnp.asarray(np.concatenate([w2, np.zeros(8, np.uint16)])),
        trows, jnp.asarray(s2), jnp.int32(0), m)
    rans.check_final_states(s_end)
    # channel of element e is e % lanes % c == e % c here
    assert np.array_equal(np.asarray(dec), sym)


def test_table_cdf_rate_and_chaining():
    rng = np.random.default_rng(9)
    c, n, lanes = 8, 16, 32
    m = 8192
    table = _mk_tables(rng, c, n)
    trows = jnp.asarray(table[np.arange(lanes) % c])
    # skewed symbols per channel: sample from each channel's own table
    chan = (np.arange(m) % c)
    freqs = np.diff(table.astype(np.int64), axis=1) / 65536.0
    sym = np.array([rng.choice(n, p=freqs[ch] / freqs[ch].sum())
                    for ch in chan], np.int32)
    states = rans.initial_states(lanes)
    half = m // 2
    w1, c1, states = rans.rans_encode_cdf(
        jnp.asarray(sym[half:]), trows, states, m)
    w0, c0, states = rans.rans_encode_cdf(
        jnp.asarray(sym[:half]), trows, states, m)
    blob = rans.pack_stream(
        [np.asarray(w0), np.asarray(w1)],
        [int(np.asarray(c0)), int(np.asarray(c1))], np.asarray(states))
    ideal = -np.log2(freqs[chan, sym]).sum()
    assert len(blob) * 8 < ideal * 1.03 + lanes * 32 + 128
    w2, s2 = rans.unpack_stream(blob, lanes)
    dec, s_end, _ = rans.rans_decode_cdf(
        jnp.asarray(np.concatenate([w2, np.zeros(8, np.uint16)])),
        trows, jnp.asarray(s2), jnp.int32(0), m)
    rans.check_final_states(s_end)
    assert np.array_equal(np.asarray(dec), sym)


def test_pick_lanes():
    assert rans.pick_lanes(65536) == 1024
    assert rans.pick_lanes(1024) == 1024
    assert rans.pick_lanes(64) == 64
    assert rans.pick_lanes(4096, max_lanes=32) == 32
    assert rans.pick_lanes(96) == 32  # largest pow2 divisor


# ------------------------- mask-wire nibble coding ---------------------------


class TestMaskWire:
    """Decode-side mask transport coding: device nibble rANS unit
    (mask_encode) inverted by the C++ runtime (pcgc_rans_mask_decode) and
    the numpy mirror (mask_decode_np)."""

    def _roundtrip(self, data):
        import jax
        from pcgcv1_tpu import native
        nb = len(data)
        lanes = rans.mask_lanes(nb)
        cap = nb // 2 + nb // 8 + lanes + 4096
        w, c, st, h = jax.jit(rans.mask_encode, static_argnums=2)(
            jnp.asarray(data), rans.initial_states(lanes), cap)
        c = int(c)
        assert c <= cap
        w = np.asarray(w)[:c]
        out_cc = native.rans_mask_decode(w, np.asarray(st),
                                         np.asarray(h), nb)
        out_np = rans.mask_decode_np(w, np.asarray(st), np.asarray(h),
                                     nb, lanes)
        assert np.array_equal(out_cc, data)
        assert np.array_equal(out_np, data)
        return 2 * c + 4 * lanes + 64  # wire bytes

    def test_sparse_masks_roundtrip_and_shrink(self, rng):
        bits = (rng.random(64 * 4096) < 0.02).astype(np.uint8)
        data = np.packbits(bits)
        wire = self._roundtrip(data)
        assert wire < len(data) // 3  # >3x even with the per-unit flush

    def test_degenerate_all_zero_and_all_one(self):
        self._roundtrip(np.zeros(8192, np.uint8))
        self._roundtrip(np.full(8192, 255, np.uint8))

    def test_uniform_bytes_within_cap(self, rng):
        data = rng.integers(0, 256, 32768).astype(np.uint8)
        self._roundtrip(data)

    def test_corruption_detected(self, rng):
        import jax
        from pcgcv1_tpu import native
        data = np.packbits((rng.random(32768) < 0.05).astype(np.uint8))
        nb = len(data)
        lanes = rans.mask_lanes(nb)
        cap = nb // 2 + nb // 8 + lanes + 4096
        w, c, st, h = jax.jit(rans.mask_encode, static_argnums=2)(
            jnp.asarray(data), rans.initial_states(lanes), cap)
        w = np.asarray(w)[:int(c)].copy()
        w[len(w) // 2] ^= 0x5A5A
        with pytest.raises(ValueError):
            native.rans_mask_decode(w, np.asarray(st), np.asarray(h), nb)

    def test_cdf_build_matches_cpp(self, rng):
        """The jnp and C++ CDF builders must agree bin for bin (a
        divergence corrupts every stream) — cross-checked through a
        round trip whose histogram exercises scaling + remainders."""
        # highly skewed histogram with a forced scale-down (>2^15 total)
        bits = (rng.random(8 * 65536) < 0.007).astype(np.uint8)
        self._roundtrip(np.packbits(bits))
