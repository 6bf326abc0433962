"""BD-rate report generation from eval CSVs."""

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


def test_compare_plot(tmp_path):
    p = str(tmp_path / "c.png")
    report.compare_plot({"a": _curve(0.2, 60),
                         "b": _curve(0.2, 61, rate_mult=0.7)}, p)
    import os
    assert os.path.getsize(p) > 1000
