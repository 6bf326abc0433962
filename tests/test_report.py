"""BD-rate report generation from eval CSVs."""

import numpy as np
import pandas as pd

from pcgcv1_tpu import report


def _curve(base_bpp, base_psnr, n=5, rate_mult=1.0):
    return [(base_bpp * rate_mult * (1.6 ** i), base_psnr + 2.5 * i)
            for i in range(n)]


def test_bd_table_known_shift():
    anchor = {"seqA": _curve(0.2, 60), "seqB": _curve(0.3, 58)}
    codec = {s: [(r / 2, p) for r, p in c] for s, c in anchor.items()}
    df = report.bd_table(codec, {"anchor": anchor})
    assert abs(df.loc["seqA", "bdrate vs anchor"] - (-50)) < 0.5
    assert abs(df.loc["average", "bdrate vs anchor"] - (-50)) < 0.5


def test_bd_table_no_overlap_is_nan_with_reason():
    """Non-overlapping PSNR spans must yield NaN + a reason column, never
    a silent 0.0, and must be excluded from the average (round-3 VERDICT
    Weak #1 / ADVICE high)."""
    anchor = {"seqA": _curve(0.2, 40),          # spans 40..50 dB
              "seqB": _curve(0.3, 58)}          # overlaps codec
    codec = {"seqA": _curve(0.1, 60),           # spans 60..70 dB
             "seqB": [(r / 2, p) for r, p in anchor["seqB"]]}
    df = report.bd_table(codec, {"anchor": anchor})
    assert np.isnan(df.loc["seqA", "bdrate vs anchor"])
    assert "overlap" in df.loc["seqA", "invalid vs anchor"]
    # average over the valid row only (seqB = -50%), not dragged to -25
    assert abs(df.loc["average", "bdrate vs anchor"] - (-50)) < 0.5


def test_bd_table_insufficient_points_gated():
    anchor = {"seqA": _curve(0.2, 60, n=2)}
    codec = {"seqA": _curve(0.1, 60)}
    df = report.bd_table(codec, {"anchor": anchor})
    assert np.isnan(df.loc["seqA", "bdrate vs anchor"])
    assert "points" in df.loc["seqA", "invalid vs anchor"]


def test_bdrate_nan_on_disjoint_spans():
    from pcgcv1_tpu.metrics import bdrate
    c1 = [(0.1, 40), (0.2, 45), (0.4, 50)]
    c2 = [(0.1, 60), (0.2, 65), (0.4, 70)]
    assert np.isnan(bdrate(c1, c2))


def test_load_rd_csv(tmp_path):
    df = pd.DataFrame({
        "bpp": [0.4, 0.1, 0.2],
        "d1_psnr": [70.0, 60.0, 65.0],
        "d2_psnr": [72.0, 62.0, 67.0],
    })
    p = tmp_path / "seq.csv"
    df.to_csv(p, index=False)
    curve = report.load_rd_csv(str(p))
    assert curve == [(0.1, 60.0), (0.2, 65.0), (0.4, 70.0)]
    curve2 = report.load_rd_csv(str(p), d_metric="d2")
    assert curve2[0] == (0.1, 62.0)


def test_published_context(tmp_path):
    pub = pd.DataFrame({
        "dataset": ["8iVFB", "8iVFB", "mvub"],
        "sequence": ["longdress", "loot", "ricardo"],
        "bdrate_vs_octree_d1": [-84.16, -83.62, -82.15],
        "bdrate_vs_pcl_d1": [-91.95, -92.03, -89.89],
    })
    pub_csv = tmp_path / "bdrates.csv"
    pub.to_csv(pub_csv, index=False)
    anchor = {"seqA": _curve(0.2, 60)}
    codec = {"seqA": [(r / 2, p) for r, p in anchor["seqA"]]}
    df = report.bd_table(codec, {"octree": anchor})
    out = report.write_published_context(
        str(pub_csv), df, str(tmp_path / "ctx.md"))
    text = open(out).read()
    assert "NOT measured" in text
    assert "8iVFB" in text and "mvub" in text
    assert "seqA" in text
    # per-dataset means, not raw rows
    assert "-83.89" in text


def test_run_report_autodiscovers_published(tmp_path):
    eval_dir = tmp_path / "rd"
    eval_dir.mkdir()
    pd.DataFrame({
        "bpp": [0.1, 0.2, 0.4],
        "d1_psnr": [60.0, 65.0, 70.0],
        "d2_psnr": [62.0, 67.0, 72.0],
    }).to_csv(eval_dir / "seq.csv", index=False)
    pubdir = tmp_path / "reference_published"
    pubdir.mkdir()
    pd.DataFrame({
        "dataset": ["8iVFB"], "sequence": ["longdress"],
        "bdrate_vs_octree_d1": [-84.16],
    }).to_csv(pubdir / "bdrates.csv", index=False)
    report.run_report(str(eval_dir), str(eval_dir / "bd.csv"))
    assert (eval_dir / "bd_context.md").exists()


def test_compare_plot(tmp_path):
    p = str(tmp_path / "c.png")
    report.compare_plot({"a": _curve(0.2, 60),
                         "b": _curve(0.2, 61, rate_mult=0.7)}, p)
    import os
    assert os.path.getsize(p) > 1000


def test_run_report_vox_resolution_and_tag(tmp_path, monkeypatch):
    """voxN sequence names select their own anchor peak resolution, and
    mode-tagged CSVs (house_vox12_f) fall back to the shared input PLY."""
    eval_dir = tmp_path / "rd"
    eval_dir.mkdir()
    for name in ("house_vox12", "house_vox12_f"):
        pd.DataFrame({
            "bpp": [0.1, 0.2, 0.4],
            "d1_psnr": [60.0, 65.0, 70.0],
            "d2_psnr": [62.0, 67.0, 72.0],
        }).to_csv(eval_dir / f"{name}.csv", index=False)
    inputs = tmp_path / "inputs"
    inputs.mkdir()
    from pcgcv1_tpu.ops import write_ply
    write_ply(str(inputs / "house_vox12.ply"),
              np.random.default_rng(0).integers(
                  0, 4096, (500, 3)).astype(np.int32))

    seen = {}

    def fake_rd_curve(pts, normals, resolution, scales=None, shifts=None):
        seen["res"] = resolution
        seen["count"] = seen.get("count", 0) + 1
        return [{"bpp": 0.5, "d1_psnr": 50.0},
                {"bpp": 0.8, "d1_psnr": 55.0},
                {"bpp": 1.2, "d1_psnr": 60.0}]

    from pcgcv1_tpu.codec import anchors
    monkeypatch.setattr(anchors, "rd_curve", fake_rd_curve)
    df = report.run_report(str(eval_dir), str(eval_dir / "bd.csv"),
                           inputs_dir=str(inputs), resolution=1024)
    assert seen["res"] == 4096      # vox12 name overrides the default
    # the tagged CSV found the shared PLY, and the anchor cache deduped
    # the second (identical) curve computation
    assert seen["count"] == 1
    assert "house_vox12_f" in df.index or \
        "house_vox12_f" in getattr(df, "index", [])
    assert "bdrate_d1 vs octree" in df.columns and \
        len(df.loc["house_vox12_f"])

    # a re-report must hit the cache (no recompute at all)
    seen["count"] = 0
    report.run_report(str(eval_dir), str(eval_dir / "bd.csv"),
                      inputs_dir=str(inputs), resolution=1024)
    assert seen["count"] == 0


def test_gpcc_curve_cached_roundtrip(tmp_path, monkeypatch):
    """gpcc_curve_cached computes once via codec/gpcc.rd_curve, writes a
    JSON cache keyed by cloud identity + rungs, and serves the cache on
    the second call without touching the binary."""
    from pcgcv1_tpu.codec import gpcc
    from pcgcv1_tpu.ops import write_ply

    ply = tmp_path / "c.ply"
    pts = np.stack(np.meshgrid(*[np.arange(8)] * 3), -1).reshape(-1, 3)
    write_ply(str(ply), pts.astype(np.int32))
    calls = {"n": 0}

    def fake_rd(points, normals, resolution, qscales=(), trisoup_log2s=()):
        calls["n"] += 1
        assert tuple(trisoup_log2s) == (2, 3)
        return [{"trisoup": t, "bpp": 1.0 / t, "d1_psnr": 50.0 + t,
                 "d2_psnr": 52.0 + t} for t in trisoup_log2s]

    monkeypatch.setattr(gpcc, "available", lambda: True)
    monkeypatch.setattr(gpcc, "rd_curve", fake_rd)
    c1 = report.gpcc_curve_cached(str(ply), 1024, str(tmp_path),
                                  trisoup_log2s=(2, 3), tag="gpcc-trisoup")
    c2 = report.gpcc_curve_cached(str(ply), 1024, str(tmp_path),
                                  trisoup_log2s=(2, 3), tag="gpcc-trisoup")
    assert calls["n"] == 1          # second call served from cache
    assert c1 == c2
    assert c1["d1"] == [(0.5, 52.0), (1.0 / 3.0, 53.0)]
    # no binary -> None (callers fall back to the native anchor column)
    monkeypatch.setattr(gpcc, "available", lambda: False)
    assert report.gpcc_curve_cached(
        str(ply), 1024, str(tmp_path), trisoup_log2s=(4,),
        tag="gpcc-trisoup") is None
