"""Native runtime: range coder, Laplace/factorized coders, octree coder.

The bitexactness tests here are the rebuild's answer to the reference's
encoder/decoder-divergence bug (SURVEY.md §5): encode->decode must be exact
and encoding must be deterministic call-to-call.
"""

import numpy as np
import pytest

from pcgcv1_tpu import native


@pytest.fixture(scope="module")
def nrng():
    return np.random.default_rng(42)


class TestLaplace:
    def test_roundtrip_exact(self, nrng):
        n = 50000
        loc = nrng.normal(0, 2, n).astype(np.float32)
        scale = (np.abs(nrng.normal(1, 0.5, n)) + 1e-3).astype(np.float32)
        v = np.round(nrng.laplace(loc, scale)).astype(np.int32)
        mn, mx = int(v.min()), int(v.max())
        s = native.laplace_encode(v, loc, scale, mn, mx)
        assert np.array_equal(native.laplace_decode(s, n, loc, scale, mn, mx), v)

    def test_deterministic_bytes(self, nrng):
        n = 1000
        loc = nrng.normal(0, 2, n).astype(np.float32)
        scale = (np.abs(nrng.normal(1, 0.5, n)) + 1e-3).astype(np.float32)
        v = np.round(nrng.laplace(loc, scale)).astype(np.int32)
        s1 = native.laplace_encode(v, loc, scale, -20, 20)
        s2 = native.laplace_encode(v, loc, scale, -20, 20)
        assert s1 == s2

    def test_near_optimal_rate(self, nrng):
        n = 200000
        b = 1.7
        loc = np.zeros(n, np.float32)
        scale = np.full(n, b, np.float32)
        v = np.round(nrng.laplace(0, b, n)).astype(np.int32)
        s = native.laplace_encode(v, loc, scale, int(v.min()), int(v.max()))
        _, counts = np.unique(v, return_counts=True)
        p = counts / n
        entropy = -(p * np.log2(p)).sum()
        assert 8 * len(s) / n < entropy * 1.01 + 0.01

    def test_single_symbol_range(self):
        # The reference's own TODO (entropy_model.py:192-193): a one-symbol
        # alphabet broke its pmf_to_quantized_cdf. Ours must handle it.
        n = 100
        v = np.zeros(n, np.int32)
        loc = np.zeros(n, np.float32)
        scale = np.ones(n, np.float32)
        s = native.laplace_encode(v, loc, scale, 0, 0)
        assert np.array_equal(native.laplace_decode(s, n, loc, scale, 0, 0), v)
        assert len(s) <= 16  # ~zero information

    def test_extreme_scales(self, nrng):
        n = 1000
        loc = nrng.normal(0, 1, n).astype(np.float32)
        # mix of tiny (below the 1e-9 bound) and huge scales
        scale = np.where(np.arange(n) % 2 == 0, 1e-12, 1e6).astype(np.float32)
        v = np.clip(np.round(loc), -5, 5).astype(np.int32)
        s = native.laplace_encode(v, loc, scale, -5, 5)
        assert np.array_equal(native.laplace_decode(s, n, loc, scale, -5, 5), v)

    def test_loc_far_outside_range(self, nrng):
        # truncated tail: mass in-range underflows -> uniform fallback
        n = 500
        loc = np.full(n, 5000.0, np.float32)
        scale = np.full(n, 0.01, np.float32)
        v = nrng.integers(-3, 4, n).astype(np.int32)
        s = native.laplace_encode(v, loc, scale, -3, 3)
        assert np.array_equal(native.laplace_decode(s, n, loc, scale, -3, 3), v)

    def test_out_of_range_symbol_raises(self):
        v = np.array([7], np.int32)
        one = np.ones(1, np.float32)
        with pytest.raises(ValueError):
            native.laplace_encode(v, one * 0, one, -3, 3)

    def test_batch_matches_single(self, nrng):
        B, e = 8, 2048
        loc = nrng.normal(0, 2, (B, e)).astype(np.float32)
        scale = (np.abs(nrng.normal(1, 0.5, (B, e))) + 1e-3).astype(np.float32)
        v = np.round(nrng.laplace(loc, scale)).astype(np.int32)
        mns, mxs = v.min(axis=1), v.max(axis=1)
        strs = native.laplace_encode_batch(v, loc, scale, mns, mxs)
        for b in range(B):
            assert strs[b] == native.laplace_encode(
                v[b], loc[b], scale[b], int(mns[b]), int(mxs[b]))
        back = native.laplace_decode_batch(strs, e, loc, scale, mns, mxs)
        assert np.array_equal(back, v)


class TestFactorizedCdf:
    def _params(self, nrng, C=8, dims=(1, 3, 3, 3, 1)):
        dims = np.array(dims, np.int32)
        msz = int(np.sum(dims[1:] * dims[:-1]))
        vsz = int(np.sum(dims[1:]))
        mats = nrng.normal(0.5, 0.3, (C, msz)).astype(np.float32)
        bias = nrng.normal(0, 0.5, (C, vsz)).astype(np.float32)
        fact = nrng.normal(0, 0.2, (C, vsz)).astype(np.float32)
        return mats, bias, fact, dims

    def test_monotone_and_normalized(self, nrng):
        mats, bias, fact, dims = self._params(nrng)
        q = native.factorized_cdf(mats, bias, fact, dims, -8, 8)
        assert q.shape == (8, 18)
        assert np.all(q[:, 0] == 0)
        assert np.all(q[:, -1] == 65536)
        assert np.all(np.diff(q.astype(np.int64), axis=1) >= 1)

    def test_table_roundtrip(self, nrng):
        mats, bias, fact, dims = self._params(nrng, C=4)
        q = native.factorized_cdf(mats, bias, fact, dims, -6, 6)
        M = 4096
        vals = nrng.integers(0, 13, (M, 4)).astype(np.int32)
        s = native.cdf_encode(vals, q)
        assert np.array_equal(native.cdf_decode(s, M, q), vals)

    def test_deterministic_table(self, nrng):
        mats, bias, fact, dims = self._params(nrng)
        q1 = native.factorized_cdf(mats, bias, fact, dims, -6, 6)
        q2 = native.factorized_cdf(mats, bias, fact, dims, -6, 6)
        assert np.array_equal(q1, q2)

    def test_single_symbol(self, nrng):
        mats, bias, fact, dims = self._params(nrng, C=2)
        q = native.factorized_cdf(mats, bias, fact, dims, 0, 0)
        vals = np.zeros((64, 2), np.int32)
        s = native.cdf_encode(vals, q)
        assert np.array_equal(native.cdf_decode(s, 64, q), vals)


class TestOctree:
    @pytest.mark.parametrize("depth,n", [(4, 200), (8, 5000), (10, 100000)])
    def test_roundtrip(self, nrng, depth, n):
        pts = np.unique(
            nrng.integers(0, 2 ** depth, (n, 3)).astype(np.uint32), axis=0)
        s = native.octree_encode(pts, depth)
        back = native.octree_decode(s, depth, len(pts) + 10)
        assert np.array_equal(np.sort(back.astype(np.uint32), axis=0),
                              np.sort(pts, axis=0))

    def test_single_point(self):
        pts = np.array([[3, 1, 2]], np.uint32)
        s = native.octree_encode(pts, 4)
        back = native.octree_decode(s, 4, 10)
        assert np.array_equal(back, pts.astype(np.int32))

    def test_coord_overflow_raises(self):
        with pytest.raises(ValueError):
            native.octree_encode(np.array([[16, 0, 0]], np.uint32), 4)

    def test_dedup(self):
        pts = np.array([[1, 1, 1], [1, 1, 1], [2, 2, 2]], np.uint32)
        s = native.octree_encode(pts, 3)
        back = native.octree_decode(s, 3, 10)
        assert len(back) == 2

    def test_cube_positions_size(self, nrng):
        # the reference's longdress side info: 202 positions in a 16^3 box
        # coded by tmc3 to ~90 bytes (BASELINE.md) — stay in that ballpark.
        pts = np.unique(
            nrng.integers(0, 16, (202, 3)).astype(np.uint32), axis=0)
        s = native.octree_encode(pts, 4)
        assert len(s) < 250
