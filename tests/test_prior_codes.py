"""Quantized-prior code grids: JAX encoder-side definition and C++
reconstruction must agree, and the q-coder must cost ~the same rate as the
float coder."""

import jax.numpy as jnp
import numpy as np

from pcgcv1_tpu import native
from pcgcv1_tpu.codec.transforms import quantize_prior


def test_grid_definitions_roundtrip():
    rng = np.random.default_rng(0)
    loc = rng.normal(0, 3, 4096).astype(np.float32)
    scale = np.exp(rng.normal(0, 2, 4096)).astype(np.float32)
    loc_q, scale_q = quantize_prior(jnp.asarray(loc), jnp.asarray(scale))
    loc_q = np.asarray(loc_q)
    scale_q = np.asarray(scale_q)
    # reconstructions per the documented grids
    loc_r = loc_q.astype(np.float64) / 8.0
    scale_r = np.exp2(scale_q.astype(np.float64) / 8.0 - 20.0)
    assert np.abs(loc_r - np.clip(loc, -127 / 8, 127 / 8)).max() <= 1 / 16 + 1e-6
    ratio = scale_r / np.clip(scale, 2 ** -20, 2 ** (235 / 8 - 20))
    assert np.all(ratio < 2 ** (1 / 16) + 1e-9)
    assert np.all(ratio > 2 ** (-1 / 16) - 1e-9)


def test_qcoder_roundtrip_and_rate():
    rng = np.random.default_rng(1)
    n = 65536
    loc = rng.normal(0, 1.5, n).astype(np.float32)
    scale = (np.abs(rng.normal(1.0, 0.4, n)) + 0.05).astype(np.float32)
    v = np.round(rng.laplace(loc, scale)).astype(np.int32)
    mn, mx = int(v.min()), int(v.max())
    loc_q, scale_q = map(np.asarray,
                         quantize_prior(jnp.asarray(loc),
                                        jnp.asarray(scale)))
    strs = native.laplace_q_encode_batch(
        v[None], loc_q[None], scale_q[None], [mn], [mx])
    back = native.laplace_q_decode_batch(
        strs, n, loc_q[None], scale_q[None], [mn], [mx])
    assert np.array_equal(back[0], v)
    # rate within 2% of the float-prior coder
    s_float = native.laplace_encode(v, loc, scale, mn, mx)
    assert len(strs[0]) < 1.02 * len(s_float) + 16


def test_qcoder_extreme_codes():
    # all-min and all-max codes decode exactly
    n = 256
    v = np.zeros(n, np.int32)
    for lq, sq in [(-127, 0), (127, 255), (0, 0), (0, 255)]:
        loc_q = np.full((1, n), lq, np.int8)
        scale_q = np.full((1, n), sq, np.uint8)
        strs = native.laplace_q_encode_batch(v[None], loc_q, scale_q,
                                             [0], [0])
        back = native.laplace_q_decode_batch(strs, n, loc_q, scale_q,
                                             [0], [0])
        assert np.array_equal(back[0], v)
