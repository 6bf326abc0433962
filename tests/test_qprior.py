"""Integer-quantized hyper-decoder (entropy/qprior.py): exactness of the
integer arithmetic, accuracy vs the float prior, and cross-configuration
decode of prior='int' streams."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from pcgcv1_tpu.codec import bitstream, pipeline
from pcgcv1_tpu.codec.transforms import PointCloudCodec, quantize_prior
from pcgcv1_tpu.entropy import qprior
from pcgcv1_tpu.models.voxception import HyperDecoder

CS = 16


@pytest.fixture(scope="module")
def hd_setup():
    hd = HyperDecoder()
    params = hd.init(jax.random.PRNGKey(7),
                     jnp.zeros((1, 8, 8, 8, 8)))["params"]
    params = jax.tree.map(np.asarray, jax.device_get(params))
    rng = np.random.default_rng(3)
    zhat = rng.integers(-25, 25, size=(3, 8, 8, 8, 8)).astype(np.int8)
    return hd, params, zhat


def test_weight_codes_respect_budgets(hd_setup):
    _, params, _ = hd_setup
    qw = qprior.derive_weight_codes(params)
    for name, layer in qw.items():
        w = layer["w_q"].reshape(-1, layer["w_q"].shape[-1])
        assert np.abs(w).max() <= qprior.W_MAX
        assert np.array_equal(w, np.round(w))  # integer-valued
        in_max = 127 if name == "deconv1" else qprior.ACT_MAX
        assert (np.abs(w).sum(axis=0) * in_max <= qprior.ACC_BUDGET).all()


def test_f32_convs_match_int32_convs(hd_setup):
    """The core exactness claim: the f32 conv path produces bit-identical
    integers to true int32 convolution."""
    _, params, zhat = hd_setup
    qw = qprior.derive_weight_codes(params)
    x = jnp.asarray(zhat, jnp.int32)
    a = jnp.asarray([2, 3, 3], jnp.int32)
    a_in = jnp.int32(0)
    for i, (name, kind, _) in enumerate(qprior._LAYERS[:qprior.N_HIDDEN]):
        layer = qw[name]
        w = jnp.asarray(layer["w_q"])
        acc_f = qprior._conv_int(x, layer, kind)
        if kind == "conv":
            acc_i = lax.conv_general_dilated(
                x, w.astype(jnp.int32), (1, 1, 1), "SAME",
                dimension_numbers=qprior._DN)
        else:
            acc_i = lax.conv_transpose(
                x, w.astype(jnp.int32), (2, 2, 2), "SAME",
                dimension_numbers=qprior._DN)
        assert np.array_equal(np.asarray(acc_f), np.asarray(acc_i))
        b = jnp.asarray(layer["b"])
        acc = acc_i + qprior._bias_q(layer, a_in + b)
        x = jnp.clip(qprior._requant(acc, a_in + b - a[i]), 0,
                     qprior.ACT_MAX)
        a_in = a[i]


def test_q8log2_exact():
    x = np.concatenate([np.arange(1, 4096),
                        np.random.default_rng(0).integers(
                            1, 1 << 24, 4096)]).astype(np.int64)
    got = np.asarray(qprior.q8log2(jnp.asarray(x, jnp.int32)))
    want = np.round(8 * np.log2(x.astype(np.float64))).astype(np.int64)
    assert np.array_equal(got, want)


def test_qprior_tracks_float_prior(hd_setup):
    """Integer prior codes should sit on/next to the float-path codes."""
    hd, params, zhat = hd_setup
    qw = qprior.derive_weight_codes(params)
    maxes = qprior.calibration_program(hd, params, jnp.asarray(zhat))
    a = qprior.scales_from_maxes(maxes)
    lq, sq = jax.jit(qprior.apply_qprior)(
        qw, jnp.asarray(a, jnp.int32), jnp.asarray(zhat))
    loc, scale = hd.apply({"params": params}, zhat.astype(np.float32))
    lqf, sqf = quantize_prior(loc, scale)
    dl = np.abs(np.asarray(lq, np.int32) - np.asarray(lqf, np.int32))
    # loc grid is 1/8 voxel: stay within a few codes for ~all elements
    assert np.percentile(dl, 99) <= 2
    assert dl.mean() < 0.5
    ds = np.abs(np.asarray(sq, np.int32) - np.asarray(sqf, np.int32))
    assert np.median(ds) <= 2


@pytest.fixture(scope="module")
def pre():
    rng = np.random.default_rng(11)
    pts = np.clip(np.round(rng.normal(32, 14, size=(40000, 3))),
                  0, 63).astype(np.int32)
    return pipeline.preprocess_points(np.unique(pts, axis=0),
                                      cube_size=CS, min_num=10)


def _codec(**kw):
    kw.setdefault("chunk", 4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return PointCloudCodec(mode="hyper", cube_size=CS, coder="device",
                               lanes=8, **kw)


@pytest.mark.slow
class TestIntPriorCodec:
    def test_roundtrip_and_container(self, pre, tmp_path):
        codec = _codec(prior="int")
        hs, recon = codec.compress_hyper(pre.cubes, return_recon=True)
        assert hs.prior == "int"
        assert len(hs.prior_scales) == qprior.N_HIDDEN
        logits = codec.decompress_hyper(hs)
        assert np.array_equal(logits, recon)
        hs.points_numbers = pre.points_numbers
        hs.cube_positions = pre.cube_positions
        bitstream.write_hyper("q", hs, rootdir=str(tmp_path))
        back = bitstream.read_hyper("q", rootdir=str(tmp_path))
        assert back.prior == "int"
        assert back.prior_scales == hs.prior_scales
        assert back.lanes == hs.lanes
        assert [bytes(s) for s in back.y_strings] == \
            [bytes(s) for s in hs.y_strings]
        logits2 = codec.decompress_hyper(back)
        assert np.array_equal(logits2, recon)

    def test_decode_with_different_chunk(self, pre):
        """Integer prior codes are batch-shape-independent: a codec with a
        DIFFERENT chunk size must decode the stream bit-exactly (the float
        prior cannot guarantee this — it pins decode to the encode chunk)."""
        enc = _codec(prior="int", chunk=4)
        dec = _codec(prior="int", chunk=7)
        hs, recon = enc.compress_hyper(pre.cubes, return_recon=True)
        logits = dec.decompress_hyper(hs)
        assert np.array_equal(logits, recon)

    def test_rate_close_to_float_prior(self, pre):
        fl = _codec(prior="float")
        iq = _codec(prior="int")
        hs_f = fl.compress_hyper(pre.cubes)
        hs_i = iq.compress_hyper(pre.cubes)
        nf = sum(len(s) for s in hs_f.y_strings)
        ni = sum(len(s) for s in hs_i.y_strings)
        # quantized prior costs a little rate; it must stay marginal
        assert ni <= 1.05 * nf + 64

    def test_init_validation(self):
        with pytest.raises(ValueError):
            PointCloudCodec(mode="hyper", coder="host", prior="int")
        with pytest.raises(ValueError):
            PointCloudCodec(mode="factorized", prior="int")
