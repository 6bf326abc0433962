"""Octree anchor codec (G-PCC-octree role).

The reference uses the MPEG `tmc3` binary in two roles: (a) lossless coding
of cube positions (covered by `bitstream.encode_cube_positions`), and (b)
as the R-D *anchor* codec for BD-rate comparisons (`myutils/gpcc_wrapper.py`,
results.ipynb cells 22-26). This module covers role (b): a complete
standalone octree geometry codec built on the native adaptive-arithmetic
octree coder, with BOTH of G-PCC octree's rate-control conventions:

- **depth truncation** (the canonical octree lossy mode, equivalent to
  `positionQuantizationScale = 2^-shift` in tmc3): coordinates are
  floor-quantized by a right shift, the octree is coded `shift` levels
  shallower, and decode reconstructs each occupied node at its voxel
  center. This is how G-PCC octree's published rate points are produced
  and what `myutils/gpcc_wrapper.py:11-20`'s qscale flag controls.
- **positional rescale** (arbitrary `scale`, round + dedupe), matching the
  reference eval pipeline's own scaling (`process.py:29-30`) — kept for
  continuity with round-2 artifacts.
"""

from __future__ import annotations

import numpy as np

from pcgcv1_tpu import native
from pcgcv1_tpu.codec import pipeline

# Anchor container: [u8 version | u8 depth | u8 shift | u32 count | stream].
# v4 added the shift byte (depth-truncated rate points); v3 streams (no
# shift byte) are still decodable.
ANCHOR_FORMAT_VERSION = 4
_LEGACY_VERSION = 3


def encode(points, scale=1.0, shift=0):
    """Encode an integer point cloud after qscale-style quantization.

    ``shift`` > 0 floor-quantizes coordinates by ``2^shift`` (octree depth
    truncation; G-PCC's power-of-two qscale). ``scale`` != 1 applies the
    reference pipeline's round-and-dedupe rescale first. The two compose
    (rescale, then truncate), though anchors normally use one or the other.

    Returns bytes: [u8 version | u8 depth | u8 shift | u32 count | stream].
    """
    pts = pipeline.scale_points(points, scale)
    if pts.min() < 0:
        raise ValueError("points must be non-negative")
    if shift:
        if not 0 <= shift < 16:
            raise ValueError(f"shift {shift} out of range [0, 16)")
        pts = np.unique(np.asarray(pts, np.int64) >> shift, axis=0)
    maxc = int(pts.max())
    depth = max(1, int(np.ceil(np.log2(maxc + 1))) if maxc else 1)
    stream = native.octree_encode(pts.astype(np.uint32), depth)
    head = np.array([len(pts)], np.uint32).tobytes()
    return (bytes([ANCHOR_FORMAT_VERSION, depth, shift]) + head + stream)


def decode(data, scale=1.0):
    """Decode to float64 points (inverse-scaled when scale != 1).

    Depth-truncated streams reconstruct at voxel centers:
    ``(q << shift) + 2^(shift-1)`` — the standard octree partial-decode
    convention (max per-axis error 2^(shift-1)).
    """
    version = data[0]
    if version == _LEGACY_VERSION:
        depth, shift, off = data[1], 0, 2
    elif version == ANCHOR_FORMAT_VERSION:
        depth, shift, off = data[1], data[2], 3
    else:
        raise ValueError(f"anchor stream format v{version} not in "
                         f"{{v{_LEGACY_VERSION}, v{ANCHOR_FORMAT_VERSION}}}")
    count = int(np.frombuffer(data[off:off + 4], np.uint32)[0])
    pts = native.octree_decode(data[off + 4:], depth, count + 16)
    out = pts.astype(np.float64)
    if shift:
        out = out * float(1 << shift) + (float(1 << shift) / 2.0)
    if scale != 1:
        out = out * (1.0 / scale)
    return out


def rd_curve(points, normals, resolution, scales=None, shifts=None):
    """Anchor rate-distortion curve: (bpp, d1_psnr, d2_psnr) per rate point.

    By default produces the G-PCC-octree-style ladder from depth
    truncation (``shifts``, qscale = 2^-shift). ``scales`` adds
    fractional-rescale points (round + dedupe, the reference pipeline's
    own scaling) — depth truncation only reaches power-of-two qscales, so
    its ladder tops out ~63 dB at vox10, below a trained codec's operating
    range; fractional scales (e.g. 0.875, 0.75) fill the 63 dB..lossless
    interval so BD comparisons against the codec have PSNR overlap.
    Passing both merges the two ladders into one curve (callers Pareto-
    prune before any BD computation).
    """
    from pcgcv1_tpu.metrics import pc_error

    rows = []
    n = len(points)
    if scales is None and shifts is None:
        shifts = (1, 2, 3, 4, 5)
    legs = ([("scale", s) for s in (scales or ())]
            + [("shift", k) for k in (shifts or ())])
    for kind, v in legs:
        if kind == "scale":
            blob = encode(points, scale=v)
            rec = decode(blob, scale=v)
        else:
            blob = encode(points, shift=v)
            rec = decode(blob)
        m = pc_error(points, rec, resolution - 1, normals_a=normals)
        rows.append({
            kind: v,
            "bpp": 8 * len(blob) / n,
            "d1_psnr": m["mseF,PSNR (p2point)"],
            "d2_psnr": m["mseF,PSNR (p2plane)"],
        })
    return rows
