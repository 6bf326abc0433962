"""Octree anchor codec (G-PCC-octree role).

The reference uses the MPEG `tmc3` binary in two roles: (a) lossless coding
of cube positions (covered by `bitstream.encode_cube_positions`), and (b)
as the R-D *anchor* codec for BD-rate comparisons (`myutils/gpcc_wrapper.py`,
results.ipynb). This module covers role (b): a complete standalone octree
geometry codec built on the native adaptive-arithmetic octree coder —
lossless at scale 1, and rate-controlled the G-PCC way via positional
down-scaling (qscale), producing an anchor R-D curve for `metrics.bdrate`.
"""

from __future__ import annotations

import numpy as np

from pcgcv1_tpu import native
from pcgcv1_tpu.codec import pipeline


def encode(points, scale=1.0):
    """Encode an integer point cloud losslessly after optional scaling.

    Returns bytes: [u8 version | u8 depth | u32 count | octree stream].
    """
    from pcgcv1_tpu.codec.bitstream import OCTREE_FORMAT_VERSION
    pts = pipeline.scale_points(points, scale)
    if pts.min() < 0:
        raise ValueError("points must be non-negative")
    maxc = int(pts.max())
    depth = max(1, int(np.ceil(np.log2(maxc + 1))) if maxc else 1)
    stream = native.octree_encode(pts.astype(np.uint32), depth)
    head = np.array([len(pts)], np.uint32).tobytes()
    return bytes([OCTREE_FORMAT_VERSION, depth]) + head + stream


def decode(data, scale=1.0):
    """Decode to float64 points (inverse-scaled when scale != 1)."""
    from pcgcv1_tpu.codec.bitstream import OCTREE_FORMAT_VERSION
    if data[0] != OCTREE_FORMAT_VERSION:
        raise ValueError(f"anchor stream format v{data[0]} != "
                         f"v{OCTREE_FORMAT_VERSION}")
    depth = data[1]
    count = int(np.frombuffer(data[2:6], np.uint32)[0])
    pts = native.octree_decode(data[6:], depth, count + 16)
    out = pts.astype(np.float64)
    if scale != 1:
        out = out * (1.0 / scale)
    return out


def rd_curve(points, normals, resolution,
             scales=(1.0, 0.75, 0.5, 0.375, 0.25, 0.125)):
    """Anchor rate-distortion curve: (bpp, d1_psnr, d2_psnr) per scale.

    Mirrors how the reference produces G-PCC anchor points (encode at a
    qscale, decode, upscale, pc_error against the original).
    """
    from pcgcv1_tpu.metrics import pc_error

    rows = []
    n = len(points)
    for s in scales:
        blob = encode(points, s)
        rec = decode(blob, s)
        m = pc_error(points, rec, resolution - 1, normals_a=normals)
        rows.append({
            "scale": s,
            "bpp": 8 * len(blob) / n,
            "d1_psnr": m["mseF,PSNR (p2point)"],
            "d2_psnr": m["mseF,PSNR (p2plane)"],
        })
    return rows
