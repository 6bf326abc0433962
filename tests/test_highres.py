"""Sparse high-resolution clouds (the reference's vox12 multi-scale
workflow, README.md:58-61: arbitrary resolution via down/up-scaling +
cube partitioning with losslessly coded positions)."""

import warnings

import numpy as np
import pytest

from pcgcv1_tpu.codec import bitstream, pipeline
from pcgcv1_tpu.codec.transforms import PointCloudCodec


@pytest.fixture(scope="module")
def sparse_highres_cloud():
    # thin sparse surface at res 2048 (vox11-scale)
    rng = np.random.default_rng(17)
    u = rng.uniform(0, 1, 40_000)
    v = rng.uniform(0, 1, 40_000)
    pts = np.stack([
        300 + 700 * u,
        200 + 800 * v,
        900 + 400 * np.sin(4 * u) * np.cos(3 * v),
    ], 1) + rng.normal(0, 1.0, (40_000, 3))
    return np.unique(np.clip(np.round(pts), 0, 2047).astype(np.int32),
                     axis=0)


@pytest.mark.slow
def test_multiscale_roundtrip(sparse_highres_cloud, tmp_path):
    """scale=0.5 on a res-2048 cloud: positions span beyond uint8*64,
    decoded points land on the x2 grid, pipeline is lossless modulo the
    scaling quantization."""
    pts = sparse_highres_cloud
    scale, cs = 0.5, 32
    pre = pipeline.preprocess_points(pts, scale=scale, cube_size=cs,
                                     min_num=10)
    assert pre.cube_positions.max() >= 16  # genuinely high-res layout
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        codec = PointCloudCodec(mode="hyper", chunk=4, cube_size=cs)
    hs = codec.compress_hyper(pre.cubes)
    hs.points_numbers = pre.points_numbers
    hs.cube_positions = pre.cube_positions
    bitstream.write_hyper("hr", hs, rootdir=str(tmp_path))
    back = bitstream.read_hyper("hr", rootdir=str(tmp_path))
    assert np.array_equal(
        np.sort(back.cube_positions, axis=0),
        np.sort(pre.cube_positions, axis=0))
    masks = codec.decompress_hyper_masks(back, back.points_numbers, 1.0)
    out = pipeline.postprocess_from_masks(masks, back.cube_positions,
                                          scale, cs)
    # outputs on the doubled grid within the original bounds
    assert out.max() <= 2047 + 1
    assert np.allclose(out * scale, np.round(out * scale))


def test_identity_codec_lossless_at_scale(sparse_highres_cloud):
    """scale!=1 pre/post round trip loses only the scaling quantization
    (process.py:25-32 semantics)."""
    pts = sparse_highres_cloud
    pre = pipeline.preprocess_points(pts, scale=0.5, cube_size=32,
                                     min_num=1)
    logits = pre.cubes.astype(np.float32) * 8 - 4
    out = pipeline.postprocess_points(
        logits, pre.points_numbers, pre.cube_positions, scale=0.5,
        cube_size=32)
    ref = pipeline.scale_points(pts, 0.5).astype(np.float64) / 0.5
    assert np.array_equal(np.sort(out, axis=0), np.sort(ref, axis=0))
