"""Metrics: pc_error equivalence (cross-validated against the MPEG binary
when available) and BD-rate math."""

import os
import subprocess

import numpy as np
import pytest

from pcgcv1_tpu.metrics import bdrate, bdsnr, estimate_normals, pc_error
from pcgcv1_tpu.ops import write_ply

MPEG_BIN = "/root/reference/myutils/pc_error_d"


def _make_clouds(seed=4, n=20000):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = 400 + rng.normal(0, 2, n)
    a = np.stack([r * np.sin(theta) * np.cos(phi),
                  r * np.sin(theta) * np.sin(phi),
                  r * np.cos(theta)], 1) + 512
    a = np.unique(np.round(a), axis=0).astype(np.int32)
    keep = rng.random(len(a)) < 0.9
    b = a[keep] + rng.integers(-1, 2, (int(keep.sum()), 3))
    b = np.unique(np.clip(b, 0, 1023), axis=0).astype(np.int32)
    return a, b


class TestPcError:
    def test_identical_clouds(self):
        a, _ = _make_clouds()
        m = pc_error(a, a, 1023, normals_a=estimate_normals(a))
        assert m["mseF      (p2point)"] == 0.0
        assert m["mseF,PSNR (p2point)"] == float("inf")
        assert m["mseF      (p2plane)"] == 0.0

    def test_one_voxel_shift(self):
        a, _ = _make_clouds()
        b = a + np.array([1, 0, 0])
        m = pc_error(a, b, 1023)
        assert abs(m["mseF      (p2point)"] - 1.0) < 0.2  # mostly dist 1
        # PSNR = 10log10(3*1023^2/mse)
        expected = 10 * np.log10(3 * 1023 ** 2 / m["mseF      (p2point)"])
        assert abs(m["mseF,PSNR (p2point)"] - expected) < 1e-9

    def test_symmetric_max(self):
        a, b = _make_clouds()
        m = pc_error(a, b, 1023)
        assert m["mseF      (p2point)"] == max(m["mse1      (p2point)"],
                                               m["mse2      (p2point)"])

    @pytest.mark.skipif(not os.access(MPEG_BIN, os.X_OK),
                        reason="MPEG pc_error binary unavailable")
    def test_matches_mpeg_binary(self, tmp_path):
        a, b = _make_clouds()
        nrm = estimate_normals(a)
        fa = str(tmp_path / "A.ply")
        fb = str(tmp_path / "B.ply")
        write_ply(fa, a.astype(np.float64), normals=nrm)
        write_ply(fb, b)
        out = subprocess.run(
            [MPEG_BIN, "-a", fa, "-b", fb, "-n", fa, "--hausdorff=1",
             "--resolution=1023"], capture_output=True, text=True).stdout
        ref = {}
        for line in out.splitlines():
            line = line.strip()
            if line.startswith(("mse", "h.")) and ":" in line:
                k, v = line.split(":")
                ref[k.strip()] = float(v)
        mine = pc_error(a, b, 1023, normals_a=nrm)

        def get(d, key):
            for k in d:
                if k.replace(" ", "") == key.replace(" ", ""):
                    return d[k]
            raise KeyError(key)

        # D1 exact (same NN distances), D2 within 0.5% (tie-pick order)
        for key in ["mse1      (p2point)", "mse2      (p2point)",
                    "mseF      (p2point)", "h.        (p2point)",
                    "h.       1(p2point)", "h.       2(p2point)"]:
            assert abs(get(ref, key) - get(mine, key)) <= 1e-3 * max(
                1.0, get(ref, key))
        for key in ["mse1      (p2plane)", "mse2      (p2plane)",
                    "mseF      (p2plane)", "h.       1(p2plane)",
                    "h.       2(p2plane)", "h.        (p2plane)"]:
            assert abs(get(ref, key) - get(mine, key)) < 0.005 * get(ref, key)
        # PSNRs within 0.03 dB
        for key in ["mseF,PSNR (p2point)", "mseF,PSNR (p2plane)",
                    "h.,PSNR  1(p2point)", "h.,PSNR  2(p2point)",
                    "h.,PSNR   (p2point)"]:
            assert abs(get(ref, key) - get(mine, key)) < 0.03
        # full header-key parity with the reference wrapper's 24 scraped
        # rows (pc_error_wrapper.py:28-44)
        for key in ref:
            get(mine, key)

    def test_normals_shape(self):
        a, _ = _make_clouds(n=2000)
        n = estimate_normals(a, k=12)
        assert n.shape == a.shape
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0,
                                   atol=1e-9)


class TestBdRate:
    def test_identical_curves(self):
        c = [(100, 60), (200, 65), (400, 70), (800, 75)]
        assert abs(bdrate(c, c)) < 1e-9
        assert abs(bdsnr(c, c)) < 1e-9

    def test_known_shift(self):
        # curve 2 = curve 1 at half the rate -> BD-rate = -50%
        c1 = [(100, 60), (200, 65), (400, 70), (800, 75)]
        c2 = [(r / 2, p) for r, p in c1]
        assert abs(bdrate(c1, c2) - (-50.0)) < 1e-6

    def test_psnr_shift(self):
        # curve 2 = curve 1 + 2 dB -> BD-PSNR = +2
        c1 = [(100, 60), (200, 65), (400, 70), (800, 75)]
        c2 = [(r, p + 2) for r, p in c1]
        assert abs(bdsnr(c1, c2) - 2.0) < 1e-6

    def test_matches_reference_implementation(self):
        # literal reimplementation of the reference bdrate_metrics.py math
        import math
        rng = np.random.default_rng(3)
        c1 = [(r, p) for r, p in zip([120, 260, 500, 900],
                                     60 + np.cumsum(rng.random(4) * 3))]
        c2 = [(r, p) for r, p in zip([100, 210, 420, 800],
                                     61 + np.cumsum(rng.random(4) * 3))]

        def ref_bdrate(set1, set2):
            r1 = [math.log(x[0]) for x in set1]
            p1 = [x[1] for x in set1]
            r2 = [math.log(x[0]) for x in set2]
            p2 = [x[1] for x in set2]
            poly1 = np.polyfit(p1, r1, 3)
            poly2 = np.polyfit(p2, r2, 3)
            lo, hi = max(min(p1), min(p2)), min(max(p1), max(p2))
            i1 = np.polyval(np.polyint(poly1), hi) - np.polyval(
                np.polyint(poly1), lo)
            i2 = np.polyval(np.polyint(poly2), hi) - np.polyval(
                np.polyint(poly2), lo)
            return (math.exp((i2 - i1) / (hi - lo)) - 1) * 100

        assert abs(bdrate(c1, c2) - ref_bdrate(c1, c2)) < 1e-9
