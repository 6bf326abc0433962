"""Bjontegaard metrics (BD-rate / BD-PSNR).

Capability parity with the reference's `myutils/bdrate_metrics.py` (the
standard cubic-polynomial-fit Bjontegaard calculation in log-rate domain).
Fresh implementation of the published method.
"""

from __future__ import annotations

import math

import numpy as np


def _curves(set1, set2, x_key):
    r1 = np.array([p[0] for p in set1], np.float64)
    d1 = np.array([p[1] for p in set1], np.float64)
    r2 = np.array([p[0] for p in set2], np.float64)
    d2 = np.array([p[1] for p in set2], np.float64)
    return np.log(r1), d1, np.log(r2), d2


def _poly_avg(x1, y1, x2, y2):
    """Fit cubic y(x) per curve, integrate both over the common x interval,
    return the mean difference (curve2 - curve1).

    Curves with fewer than 4 points fit the highest well-posed degree
    instead (the standard BD calculation assumes 4 rate points; short
    curves degrade gracefully rather than rank-deficiently).

    When the curves' x spans do not overlap the BD integral is undefined
    (it would be pure extrapolation) and the result is NaN — never a
    silent 0.0 (round-3 ADVICE: a no-overlap 0.0 landed in a release
    artifact and read as parity)."""
    deg = max(1, min(3, len(x1) - 1, len(x2) - 1))
    p1 = np.polyfit(x1, y1, deg)
    p2 = np.polyfit(x2, y2, deg)
    lo = max(x1.min(), x2.min())
    hi = min(x1.max(), x2.max())
    if hi <= lo:
        return float("nan")
    int1 = np.polyval(np.polyint(p1), hi) - np.polyval(np.polyint(p1), lo)
    int2 = np.polyval(np.polyint(p2), hi) - np.polyval(np.polyint(p2), lo)
    return (int2 - int1) / (hi - lo)


def bdsnr(metric_set1, metric_set2):
    """Average PSNR gain of curve 2 over curve 1 (dB).

    Each metric set is a list of (rate, psnr) points.
    """
    lr1, p1, lr2, p2 = _curves(metric_set1, metric_set2, 0)
    return float(_poly_avg(lr1, p1, lr2, p2))


def bdrate(metric_set1, metric_set2):
    """Average bitrate change of curve 2 vs curve 1 in percent
    (negative = curve 2 needs fewer bits at equal quality)."""
    lr1, p1, lr2, p2 = _curves(metric_set1, metric_set2, 0)
    # fit log-rate as a cubic of psnr, integrate over common psnr span
    avg_exp_diff = _poly_avg(p1, lr1, p2, lr2)
    avg_exp_diff = min(avg_exp_diff, 200.0)  # clamp ill-formed fits
    return float((math.exp(avg_exp_diff) - 1) * 100)
