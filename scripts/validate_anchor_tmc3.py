"""Cross-validate the in-repo octree anchor against the real MPEG tmc3.

The BD-rate evidence in `artifacts/rd_release/` compares the learned codec
against `pcgcv1_tpu/codec/anchors.py` — our own octree codec standing in
the G-PCC-octree role. This script anchors those numbers to the MPEG
implementation: it drives the reference's bundled TMC13 binary
(`/root/reference/myutils/tmc3`, the same ELF `myutils/gpcc_wrapper.py`
uses) over the identical rate ladder (qscale = 2^-shift for the depth
rungs, fractional qscale for the scale rungs), scores both codecs with the
same `pc_error` implementation, and writes a side-by-side CSV.

Flag surface matches the reference wrapper (`gpcc_wrapper.py:11-20`):
octree mode (trisoup_node_size_log2=0), ctxOccupancyReductionFactor=3,
neighbourAvailBoundaryLog2=8, intra_pred_max_node_size_log2=6,
inferredDirectCodingMode=0 — only positionQuantizationScale varies.

Usage:
    python scripts/validate_anchor_tmc3.py [ply ...] \
        [--out artifacts/anchor_vs_tmc3.csv]
"""

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from pcgcv1_tpu.codec import anchors  # noqa: E402
from pcgcv1_tpu.metrics import estimate_normals, pc_error  # noqa: E402
from pcgcv1_tpu.ops import load_ply, write_ply  # noqa: E402

TMC3 = "/root/reference/myutils/tmc3"


def tmc3_encode(ply_path, bin_path, qscale):
    cmd = [TMC3, "--mode=0",
           f"--positionQuantizationScale={qscale}",
           "--trisoup_node_size_log2=0",
           "--ctxOccupancyReductionFactor=3",
           "--neighbourAvailBoundaryLog2=8",
           "--intra_pred_max_node_size_log2=6",
           "--inferredDirectCodingMode=0",
           f"--uncompressedDataPath={ply_path}",
           f"--compressedStreamPath={bin_path}"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return os.path.getsize(bin_path)


def tmc3_decode(bin_path, rec_path):
    subprocess.run([TMC3, "--mode=1",
                    f"--compressedStreamPath={bin_path}",
                    f"--reconstructedDataPath={rec_path}"],
                   check=True, capture_output=True, text=True)
    return load_ply(rec_path)


def run_cloud(ply, rungs, tmp):
    pts = load_ply(ply).astype(np.int64)
    res = 1 << int(np.ceil(np.log2(pts.max() + 1)))
    normals = estimate_normals(pts)
    n = len(pts)
    rows = []
    for kind, v in rungs:
        q = 2.0 ** (-v) if kind == "shift" else float(v)
        # --- MPEG tmc3 ---
        binf = os.path.join(tmp, "s.bin")
        recf = os.path.join(tmp, "r.ply")
        nbytes = tmc3_encode(ply, binf, q)
        # TMC13 v6 inverse-scales internally: the reconstruction is in
        # the ORIGINAL coordinate frame (multiples of 1/q), anchored at
        # the quantization-cell corner (no half-cell offset — our anchor
        # reconstructs at cell centers, halving the max error, so our
        # anchor is the *stronger* baseline at equal bpp)
        rec = tmc3_decode(binf, recf).astype(np.float64)
        m = pc_error(pts, rec, res - 1, normals_a=normals)
        # --- our octree anchor at the matching rung ---
        if kind == "shift":
            blob = anchors.encode(pts, shift=v)
            ours = anchors.decode(blob)
        else:
            blob = anchors.encode(pts, scale=v)
            ours = anchors.decode(blob, scale=v)
        mo = pc_error(pts, ours, res - 1, normals_a=normals)
        row = {
            "cloud": os.path.splitext(os.path.basename(ply))[0],
            "rung": f"{kind}={v}", "qscale": q,
            "tmc3_bpp": 8 * nbytes / n,
            "ours_bpp": 8 * len(blob) / n,
            "tmc3_d1": m["mseF,PSNR (p2point)"],
            "ours_d1": mo["mseF,PSNR (p2point)"],
            "tmc3_d2": m["mseF,PSNR (p2plane)"],
            "ours_d2": mo["mseF,PSNR (p2plane)"],
        }
        row["bpp_ratio"] = row["ours_bpp"] / row["tmc3_bpp"]
        row["d1_delta_db"] = row["ours_d1"] - row["tmc3_d1"]
        rows.append(row)
        print({k: round(val, 4) if isinstance(val, float) else val
               for k, val in row.items()})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("plys", nargs="*",
                    default=["artifacts/synth_vox10.ply",
                             "artifacts/composite_crop_vox10.ply"])
    ap.add_argument("--out", default="artifacts/anchor_vs_tmc3.csv")
    ap.add_argument("--shifts", default="1,2,3,4")
    ap.add_argument("--scales", default="0.875,0.75")
    args = ap.parse_args()
    if not os.access(TMC3, os.X_OK):
        sys.exit(f"tmc3 binary not found/executable at {TMC3}")
    rungs = ([("shift", int(s)) for s in args.shifts.split(",") if s]
             + [("scale", float(s)) for s in args.scales.split(",") if s])
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        for ply in args.plys:
            rows += run_cloud(ply, rungs, tmp)
    import pandas as pd
    df = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    df.to_csv(args.out, index=False)
    print(f"wrote {args.out}")
    print(df[["rung", "bpp_ratio", "d1_delta_db"]]
          .groupby("rung").mean().round(3))


if __name__ == "__main__":
    main()
