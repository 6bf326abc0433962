"""Failure-handling: corrupt/truncated bitstreams must fail safely (decode
to garbage values, never hang or crash), and fresh codec instances must be
bit-compatible with each other (the determinism contract across process
restarts via identical programs)."""

import warnings

import numpy as np
import pytest

from pcgcv1_tpu import native
from pcgcv1_tpu.codec import pipeline
from pcgcv1_tpu.codec.transforms import PointCloudCodec


@pytest.fixture(scope="module")
def pre():
    rng = np.random.default_rng(13)
    pts = np.unique(np.clip(np.round(rng.normal(32, 13, (30000, 3))),
                            0, 63).astype(np.int32), axis=0)
    return pipeline.preprocess_points(pts, cube_size=16, min_num=10)


def _codec(**kw):
    kw.setdefault("chunk", 4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return PointCloudCodec(mode="hyper", cube_size=16, **kw)


def test_truncated_stream_decodes_without_crash():
    n = 1000
    loc = np.zeros(n, np.float32)
    scale = np.ones(n, np.float32)
    rng = np.random.default_rng(0)
    v = rng.integers(-3, 4, n).astype(np.int32)
    s = native.laplace_encode(v, loc, scale, -3, 3)
    out = native.laplace_decode(s[: len(s) // 3], n, loc, scale, -3, 3)
    assert out.shape == (n,)
    assert out.min() >= -3 and out.max() <= 3  # in-alphabet garbage


def test_corrupt_stream_decodes_without_crash():
    n = 4096
    rng = np.random.default_rng(1)
    loc = rng.normal(0, 1, n).astype(np.float32)
    scale = (np.abs(rng.normal(1, 0.3, n)) + 0.1).astype(np.float32)
    v = np.round(rng.laplace(loc, scale)).astype(np.int32)
    mn, mx = int(v.min()), int(v.max())
    s = bytearray(native.laplace_encode(v, loc, scale, mn, mx))
    s[len(s) // 2] ^= 0xFF
    out = native.laplace_decode(bytes(s), n, loc, scale, mn, mx)
    assert out.min() >= mn and out.max() <= mx


def test_octree_garbage_decode_bounded():
    blob = bytes(np.random.default_rng(2).integers(0, 256, 64,
                                                   endpoint=False)
                 .astype(np.uint8))
    # depth-4 octree has at most 16^3 leaves; must terminate and fit
    out = native.octree_decode(blob, 4, 16 ** 3 + 8)
    assert len(out) <= 16 ** 3


@pytest.mark.slow
def test_fresh_codec_instance_bit_compatibility(pre):
    """Encode with one codec instance, decode with a freshly constructed
    one (new jit compilations): must reconstruct identical latents —
    process-restart determinism."""
    enc = _codec()
    hs = enc.compress_hyper(pre.cubes)
    dec = _codec()
    logits_a = enc.decompress_hyper(hs)
    logits_b = dec.decompress_hyper(hs)
    assert np.array_equal(logits_a, logits_b)


@pytest.mark.slow
def test_repeated_encode_identical_streams(pre):
    codec = _codec()
    hs1 = codec.compress_hyper(pre.cubes)
    hs2 = codec.compress_hyper(pre.cubes)
    assert hs1.y_strings == hs2.y_strings
    assert hs1.z_strings == hs2.z_strings


@pytest.mark.slow
def test_rho_search(tmp_path, pre):
    """rho search runs end-to-end and returns a sane value."""
    import configparser
    from pcgcv1_tpu import evalharness
    from pcgcv1_tpu.ops import write_ply
    from pcgcv1_tpu.codec.pipeline import postprocess_from_masks

    # reconstruct a cloud file from the fixture's cubes
    pts = postprocess_from_masks(pre.cubes[..., 0], pre.cube_positions,
                                 1.0, 16)
    f = str(tmp_path / "c.ply")
    write_ply(f, pts.astype(np.int64))
    cfg = configparser.ConfigParser()
    cfg["R1"] = {"scale": "1.0", "ckpt_dir": "", "cube_size": "16",
                 "min_num": "10"}
    codec = _codec()
    rho, psnr = evalharness.search_optimal_rho(
        f, codec, cfg["R1"], 64, str(tmp_path), "r1",
        rhos=(1.0, 1.1), also_down=(0.9,))
    assert 0.8 <= rho <= 1.2
    assert np.isfinite(psnr)
