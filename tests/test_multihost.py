"""Multi-host cube sharding: per-host compression must reproduce the
single-host bitstream payloads exactly (the codec is embarrassingly
parallel over cubes)."""

import warnings

import numpy as np

from pcgcv1_tpu.codec import pipeline
from pcgcv1_tpu.codec.transforms import PointCloudCodec
from pcgcv1_tpu.parallel import multihost


def test_host_slices():
    assert multihost.host_slices(10, 3) == [(0, 4), (4, 7), (7, 10)]
    assert multihost.host_slices(2, 4) == [(0, 1), (1, 2), (2, 2), (2, 2)]


def test_sharded_compression_matches_single_host():
    rng = np.random.default_rng(3)
    pts = np.unique(np.clip(np.round(rng.normal(32, 13, (40000, 3))),
                            0, 63).astype(np.int32), axis=0)
    pre = pipeline.preprocess_points(pts, cube_size=16, min_num=10)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        codec = PointCloudCodec(mode="hyper", chunk=4, cube_size=16)

    hs_full = codec.compress_hyper(pre.cubes)

    num_hosts = 3
    shards = []
    for h in range(num_hosts):
        pre_h, _ = multihost.shard_preprocess(pre, num_hosts, h)
        hs = codec.compress_hyper(pre_h.cubes)
        hs.points_numbers = pre_h.points_numbers
        hs.cube_positions = pre_h.cube_positions
        shards.append(hs)
    merged = multihost.merge_hyper_shards(shards)

    # y payloads identical cube-for-cube, ranges identical
    assert merged.y_strings == hs_full.y_strings
    assert np.array_equal(merged.y_min_vs, hs_full.y_min_vs)
    assert np.array_equal(merged.y_max_vs, hs_full.y_max_vs)
    assert merged.z_shape[0] == hs_full.z_shape[0]
    assert np.array_equal(merged.cube_positions, pre.cube_positions)

    # framed z splits back into per-shard streams
    zs = multihost.split_framed_z(merged.z_strings, num_hosts)
    assert zs == [sh.z_strings for sh in shards]
