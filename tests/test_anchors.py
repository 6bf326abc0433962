"""Octree anchor codec: lossless round trip and R-D curve sanity."""

import numpy as np
import pytest

from pcgcv1_tpu.codec import anchors


@pytest.fixture(scope="module")
def surface_cloud():
    rng = np.random.default_rng(8)
    theta = rng.uniform(0, np.pi, 60000)
    phi = rng.uniform(0, 2 * np.pi, 60000)
    r = 200 + rng.normal(0, 1.5, 60000)
    pts = np.stack([r * np.sin(theta) * np.cos(phi),
                    r * np.sin(theta) * np.sin(phi),
                    r * np.cos(theta)], 1) + 256
    return np.unique(np.round(pts), axis=0).astype(np.int32)


def test_lossless_roundtrip(surface_cloud):
    blob = anchors.encode(surface_cloud, 1.0)
    rec = anchors.decode(blob, 1.0)
    assert np.array_equal(np.sort(rec.astype(np.int64), axis=0),
                          np.sort(surface_cloud, axis=0))


def test_scaled_rate_drops(surface_cloud):
    b1 = anchors.encode(surface_cloud, 1.0)
    b2 = anchors.encode(surface_cloud, 0.5)
    assert len(b2) < 0.7 * len(b1)


def test_rd_curve_monotone(surface_cloud):
    from pcgcv1_tpu.metrics import estimate_normals
    normals = estimate_normals(surface_cloud)
    rows = anchors.rd_curve(surface_cloud, normals, 512,
                            scales=(1.0, 0.5, 0.25))
    bpps = [r["bpp"] for r in rows]
    psnrs = [r["d1_psnr"] for r in rows]
    assert bpps[0] > bpps[1] > bpps[2]
    assert psnrs[0] > psnrs[1] > psnrs[2]
    assert psnrs[0] == float("inf")  # lossless at scale 1


def test_bdrate_against_anchor(surface_cloud):
    """BD-rate of a strictly better curve vs the anchor is negative."""
    from pcgcv1_tpu.metrics import bdrate, estimate_normals
    normals = estimate_normals(surface_cloud)
    rows = anchors.rd_curve(surface_cloud, normals, 512,
                            scales=(0.75, 0.5, 0.375, 0.25))
    anchor = [(r["bpp"], r["d1_psnr"]) for r in rows]
    better = [(bpp * 0.5, psnr) for bpp, psnr in anchor]
    assert abs(bdrate(anchor, better) - (-50.0)) < 1.0


def test_depth_truncation_roundtrip(surface_cloud):
    """shift=k reconstructs voxel centers: max per-axis error 2^(k-1)."""
    for k in (1, 2, 3):
        blob = anchors.encode(surface_cloud, shift=k)
        rec = anchors.decode(blob)
        # every reconstructed point is the center of an occupied 2^k node
        q = np.unique(surface_cloud.astype(np.int64) >> k, axis=0)
        centers = q * (1 << k) + (1 << k) / 2.0
        assert rec.shape == centers.shape
        assert np.array_equal(
            np.sort(rec.view(np.float64).reshape(-1, 3), axis=0),
            np.sort(centers, axis=0))


def test_depth_truncation_rate_monotone(surface_cloud):
    """Deeper truncation = fewer bits; bpp strictly decreasing in shift."""
    sizes = [len(anchors.encode(surface_cloud, shift=k)) for k in (0, 1, 2, 3)]
    assert sizes[0] > sizes[1] > sizes[2] > sizes[3]


def test_rd_curve_depth_mode(surface_cloud):
    """Default rd_curve (depth mode) is monotone in rate and quality."""
    from pcgcv1_tpu.metrics import estimate_normals
    normals = estimate_normals(surface_cloud)
    rows = anchors.rd_curve(surface_cloud, normals, 512, shifts=(1, 2, 3))
    bpps = [r["bpp"] for r in rows]
    psnrs = [r["d1_psnr"] for r in rows]
    assert bpps[0] > bpps[1] > bpps[2]
    assert psnrs[0] > psnrs[1] > psnrs[2]
    assert all(np.isfinite(p) for p in psnrs)


def test_legacy_v3_stream_decodes(surface_cloud):
    """Round-2 (v3, no shift byte) anchor streams still decode."""
    blob = anchors.encode(surface_cloud)
    legacy = bytes([3]) + blob[1:2] + blob[3:]  # drop the shift byte
    rec = anchors.decode(legacy)
    assert np.array_equal(np.sort(rec.astype(np.int64), axis=0),
                          np.sort(surface_cloud, axis=0))


TMC3_BIN = "/root/reference/myutils/tmc3"


@pytest.mark.skipif(not __import__("os").access(TMC3_BIN, 1),
                    reason="MPEG tmc3 binary unavailable")
def test_anchor_matches_mpeg_tmc3(surface_cloud, tmp_path):
    """Cross-validation against the real MPEG TMC13 v6 octree codec (the
    binary the reference's gpcc_wrapper.py drives): at matching qscale
    rungs our anchor's rate is within a few percent and its D1 within a
    fraction of a dB on depth rungs (scripts/validate_anchor_tmc3.py runs
    the full ladder on the release clouds -> artifacts/anchor_vs_tmc3.csv).
    """
    import sys

    sys.path.insert(0, "scripts")
    import validate_anchor_tmc3 as val

    from pcgcv1_tpu.ops import write_ply
    ply = str(tmp_path / "c.ply")
    write_ply(ply, surface_cloud)
    rows = val.run_cloud(ply, [("shift", 1), ("shift", 2)], str(tmp_path))
    for row in rows:
        # wider rate tolerance than the release CSV (2-4% on ~1M-point
        # clouds): at this test size the deep rungs keep only ~10k nodes
        # and per-stream overheads show
        assert 0.8 < row["bpp_ratio"] < 1.25, row
        assert abs(row["d1_delta_db"]) < 0.5, row


@pytest.mark.skipif(not __import__("os").access(TMC3_BIN, 1),
                    reason="MPEG tmc3 binary unavailable")
def test_gpcc_trisoup_anchor_role(surface_cloud, tmp_path):
    """codec/gpcc.py drives TMC13 in both anchor roles (octree qscale and
    trisoup surface triangulation — the reference's stronger published
    MPEG anchor on dense smooth scans) and scores with the repo's
    pc_error: finite PSNRs and plausible rates. (No cross-role quality
    ordering is asserted: on this noisy-shell fixture triangulation loses
    to plain octree; on mesh-sampled release clouds it wins.)"""
    from pcgcv1_tpu.codec import gpcc
    from pcgcv1_tpu.metrics import estimate_normals

    assert gpcc.available()
    normals = estimate_normals(surface_cloud)
    rows = gpcc.rd_curve(surface_cloud.astype(np.int64), normals, 512,
                         qscales=(0.5,), trisoup_log2s=(2,))
    assert len(rows) == 2
    octree, trisoup = rows
    assert octree["qscale"] == 0.5 and trisoup["trisoup"] == 2
    for r in rows:
        assert 0 < r["bpp"] < 16
        assert np.isfinite(r["d1_psnr"]) and np.isfinite(r["d2_psnr"])
        assert r["d1_psnr"] > 40  # both roles reconstruct the geometry
