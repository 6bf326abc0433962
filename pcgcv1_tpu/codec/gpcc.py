"""MPEG G-PCC (TMC13) anchor driver — octree AND trisoup roles.

The reference's BD-rate evidence compares PCGCv1 against MPEG G-PCC run
through the bundled TMC13 binary (`myutils/gpcc_wrapper.py:5-42`, consumed
by `results.ipynb` cells 22-26), and its published tables also include the
G-PCC *trisoup* (surface triangulation) configuration. This module covers
both roles for any TMC13 binary on the host:

- **octree** rate points via ``positionQuantizationScale`` (the reference
  wrapper's exact flag surface);
- **trisoup** rate points via ``trisoup_node_size_log2`` (surface
  triangulation; the stronger MPEG anchor on dense smooth content).

Reconstructions are scored with the same `pc_error` implementation as
every other curve in this repo, so BD comparisons are apples-to-apples.
The binary is located through ``PCGC_TMC3`` (falling back to the
reference's bundled release-v6.0 ELF when present); when no binary is
available the in-repo native octree anchor (`codec/anchors.py`) remains
the always-available octree-role fallback — `scripts/validate_anchor_tmc3.py`
cross-validates the two on the release clouds.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

_DEFAULT_TMC3 = "/root/reference/myutils/tmc3"


def binary():
    """Path of a usable TMC13 binary, or None."""
    path = os.environ.get("PCGC_TMC3", _DEFAULT_TMC3)
    return path if os.access(path, os.X_OK) else None


def available():
    return binary() is not None


def encode(ply_path, bin_path, qscale=1.0, trisoup_log2=0):
    """TMC13 encode; returns the compressed size in bytes.

    Flag surface matches `myutils/gpcc_wrapper.py:11-20` (octree mode,
    ctxOccupancyReductionFactor=3, neighbourAvailBoundaryLog2=8,
    intra_pred_max_node_size_log2=6, inferredDirectCodingMode=0) with
    ``trisoup_node_size_log2`` switching to surface triangulation.
    """
    tmc3 = binary()
    if tmc3 is None:
        raise RuntimeError("no TMC13 binary (set PCGC_TMC3)")
    cmd = [tmc3, "--mode=0",
           f"--positionQuantizationScale={qscale}",
           f"--trisoup_node_size_log2={int(trisoup_log2)}",
           "--ctxOccupancyReductionFactor=3",
           "--neighbourAvailBoundaryLog2=8",
           "--intra_pred_max_node_size_log2=6",
           "--inferredDirectCodingMode=0",
           f"--uncompressedDataPath={ply_path}",
           f"--compressedStreamPath={bin_path}"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return os.path.getsize(bin_path)


def decode(bin_path, rec_path):
    """TMC13 decode; returns the reconstructed points (float64)."""
    from pcgcv1_tpu.ops import load_ply
    tmc3 = binary()
    if tmc3 is None:
        raise RuntimeError("no TMC13 binary (set PCGC_TMC3)")
    subprocess.run([tmc3, "--mode=1",
                    f"--compressedStreamPath={bin_path}",
                    f"--reconstructedDataPath={rec_path}"],
                   check=True, capture_output=True, text=True)
    return load_ply(rec_path).astype(np.float64)


def rd_curve(points, normals, resolution, qscales=(), trisoup_log2s=()):
    """G-PCC rate-distortion curve on an integer point cloud.

    ``qscales`` produces octree rate points (reference wrapper ladder);
    ``trisoup_log2s`` produces trisoup points (node size 2^k, qscale 1).
    Returns rows like `anchors.rd_curve`: bpp / d1_psnr / d2_psnr plus the
    rung identity, so callers can merge or split the two ladders.
    """
    from pcgcv1_tpu.metrics import pc_error
    from pcgcv1_tpu.ops import write_ply

    legs = ([("qscale", float(q)) for q in (qscales or ())]
            + [("trisoup", int(t)) for t in (trisoup_log2s or ())])
    rows = []
    n = len(points)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in.ply")
        write_ply(src, np.asarray(points))
        for kind, v in legs:
            binf = os.path.join(tmp, "s.bin")
            recf = os.path.join(tmp, "r.ply")
            if kind == "qscale":
                nbytes = encode(src, binf, qscale=v)
            else:
                nbytes = encode(src, binf, trisoup_log2=v)
            rec = decode(binf, recf)
            m = pc_error(points, rec, resolution - 1, normals_a=normals)
            rows.append({
                kind: v,
                "bpp": 8 * nbytes / n,
                "d1_psnr": m["mseF,PSNR (p2point)"],
                "d2_psnr": m["mseF,PSNR (p2plane)"],
            })
    return rows
