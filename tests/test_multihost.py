"""Multi-host cube sharding: per-host compression must reproduce the
single-host bitstream payloads exactly (the codec is embarrassingly
parallel over cubes)."""

import warnings

import numpy as np
import pytest

from pcgcv1_tpu.codec import pipeline
from pcgcv1_tpu.codec.transforms import PointCloudCodec
from pcgcv1_tpu.parallel import multihost


def test_host_slices():
    assert multihost.host_slices(10, 3) == [(0, 4), (4, 7), (7, 10)]
    assert multihost.host_slices(2, 4) == [(0, 1), (1, 2), (2, 2), (2, 2)]


@pytest.mark.slow
def test_sharded_compression_matches_single_host(tmp_path):
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

    # multi-host container round trip: write -> read is bit-exact per shard
    from pcgcv1_tpu.codec import bitstream
    sizes = bitstream.write_hyper("mh", merged, rootdir=str(tmp_path))
    assert sizes["strings"] == sum(
        len(s) for sh in shards for s in sh.y_strings)
    back = bitstream.read_hyper("mh", str(tmp_path))
    assert len(back.shards) == num_hosts
    for sh, rb in zip(shards, back.shards):
        assert rb.y_strings == sh.y_strings
        assert rb.z_strings == sh.z_strings
        assert (rb.z_min_v, rb.z_max_v) == (sh.z_min_v, sh.z_max_v)
        assert rb.z_shape == tuple(sh.z_shape)
        assert np.array_equal(rb.points_numbers, sh.points_numbers)
        assert np.array_equal(rb.cube_positions, sh.cube_positions)
    assert np.array_equal(back.points_numbers, pre.points_numbers)
    assert np.array_equal(back.cube_positions, pre.cube_positions)

    # and the merged container DECODES: masks equal the single-host decode
    hs_full.points_numbers = pre.points_numbers
    hs_full.cube_positions = pre.cube_positions
    masks_full = codec.decompress_hyper_masks(hs_full, pre.points_numbers)
    masks_mh = codec.decompress_hyper_masks(back, back.points_numbers)
    assert np.array_equal(masks_mh, masks_full)


@pytest.mark.slow
def test_multihost_cli_roundtrip(tmp_path):
    from pcgcv1_tpu import cli
    from pcgcv1_tpu.ops import load_ply, write_ply
    rng = np.random.default_rng(11)
    pts = np.unique(np.clip(np.round(rng.normal(32, 12, (30000, 3))),
                            0, 63).astype(np.int32), axis=0)
    f = str(tmp_path / "toy.ply")
    write_ply(f, pts)
    rootdir = str(tmp_path / "comp")
    common = ["--cube_size", "16", "--min_num", "10", "--chunk", "4",
              "--rootdir", rootdir]
    # per-host shard files + explicit merge
    for h in range(2):
        cli.main(["compress", f, "toy", "--num_hosts", "2",
                  "--host_id", str(h)] + common)
    cli.main(["merge-shards",
              "--inputs", f"{rootdir}/toy.host0", f"{rootdir}/toy.host1",
              "--output", f"{rootdir}/toy"])
    out = str(tmp_path / "rec.ply")
    cli.main(["decompress", f"{rootdir}/toy", out] + common)
    rec = load_ply(out)
    assert len(rec) > 0.5 * len(pts)

    # simulated all-hosts merged write equals merge-shards output
    import hashlib
    h1 = {e: hashlib.sha256(
        open(f"{rootdir}/toy{e}", "rb").read()).hexdigest()
        for e in (".strings", ".strings_head", ".strings_hyper")}
    rootdir2 = str(tmp_path / "comp2")
    cli.main(["compress", f, "toy", "--num_hosts", "2"]
             + common[:-1] + [rootdir2])
    h2 = {e: hashlib.sha256(
        open(f"{rootdir2}/toy{e}", "rb").read()).hexdigest()
        for e in (".strings", ".strings_head", ".strings_hyper")}
    assert h1 == h2
