"""Ablation-study driver.

Capability parity with the reference `eval_ablation_studies.py`: auto-
generate per-mode rate configs (reference :45-80), run the documented
ablation suite (reference :363-395; results.ipynb cells 68-110):

  1. cube_size 32 / 64 / 128 (same checkpoints — the transforms are fully
     convolutional, so one set of weights evaluates at every cube size);
  2. compression network: voxception vs simple, hyper vs factorized
     (separate checkpoints per variant);
  3. fixed threshold (fixed_thres=0) vs rho-weighted adaptive top-k;

then reduce each pair to BD-rate/BD-PSNR deltas (the role of
results.ipynb's ablation cells). Reference signs to reproduce
(BASELINE.md): cube64 beats cube32 by ~-23% D1, cube128 ~= cube64,
voxception beats simple by ~-46%, hyper beats factorized by ~-15%,
adaptive beats fixed by ~-44%.
"""

from __future__ import annotations

import argparse
import configparser
import os
import time

import numpy as np

from pcgcv1_tpu import evalharness
from pcgcv1_tpu.metrics import bdrate, bdsnr


def variant_config(path, ckpt_dirs, cube_size=64, min_num=64,
                   fixed_thres=None, extra_scales=()):
    """Write a rate-ladder INI for one ablation variant (the reference's
    set_default_config, eval_ablation_studies.py:45-80 — including its
    trick of reusing the lowest-rate checkpoint at scale 5/8 for an extra
    low-rate point via ``extra_scales``)."""
    cfg = configparser.ConfigParser()
    cfg["DEFAULT"] = {"cube_size": str(cube_size), "min_num": str(min_num)}
    if fixed_thres is not None:
        cfg["DEFAULT"]["fixed_thres"] = str(fixed_thres)
    i = 1
    for scale in extra_scales:
        cfg[f"R{i}"] = {"scale": str(scale), "ckpt_dir": ckpt_dirs[0],
                        "rho_d1": "1.0", "rho_d2": "1.0"}
        i += 1
    for ck in ckpt_dirs:
        cfg[f"R{i}"] = {"scale": "1.0", "ckpt_dir": ck,
                        "rho_d1": "1.0", "rho_d2": "1.0"}
        i += 1
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        cfg.write(f)
    return path


def _eval_variant(name, input_file, cfg_path, out_root, res, mode, model,
                  chunk, dtype, search_rho=False):
    """Run one variant's R-D sweep; returns the CSV path."""
    rootdir = os.path.join(out_root, name)
    ns = argparse.Namespace(
        input=input_file, rootdir=rootdir, cfgdir=cfg_path, res=res,
        mode=mode, modelname=model, chunk=chunk, dtype=dtype,
        search_rho=search_rho)
    evalharness.run_eval(ns)
    base = os.path.splitext(os.path.basename(input_file))[0]
    return os.path.join(rootdir, base + ".csv")


def _pareto_front(points):
    """Shared with the release report — see report.pareto_front."""
    from pcgcv1_tpu.report import pareto_front
    return pareto_front(points)


def _bd_pair(csv_a, csv_b, d_metric, min_points=3, min_overlap_db=0.3):
    """Gated BD-rate/BD-PSNR of curve A vs curve B (negative = A wins).

    Returns (bd_rate, bd_snr, reason): reason is None when the comparison
    is well-posed, else a string and the BD values are NaN. Gates (ADVICE
    round 2 — a +50,251% BD-rate over non-overlapping, non-monotone
    curves must never land in a release artifact):
      - each curve must keep >= min_points after Pareto pruning;
      - the PSNR spans must overlap by >= min_overlap_db (the BD integral
        runs over the common quality interval; no overlap = extrapolation).
    """
    from pcgcv1_tpu.report import load_rd_csv
    a = _pareto_front(load_rd_csv(csv_a, d_metric))
    b = _pareto_front(load_rd_csv(csv_b, d_metric))
    if len(a) < min_points or len(b) < min_points:
        return (float("nan"), float("nan"),
                f"insufficient rate points after Pareto pruning "
                f"({len(a)} vs {len(b)}, need {min_points})")
    lo = max(min(d for _, d in a), min(d for _, d in b))
    hi = min(max(d for _, d in a), max(d for _, d in b))
    if hi - lo < min_overlap_db:
        return (float("nan"), float("nan"),
                f"PSNR overlap {hi - lo:.2f} dB < {min_overlap_db} dB")
    return bdrate(b, a), bdsnr(b, a), None


# (variant name, mode, model, cube_size override, fixed_thres, ladder key,
#  rough seconds per rate point — used by the --deadline gate). Ordered so
# a deadline cut drops the least informative comparison first: hyper64
# anchors three BD rows, then the mode/model ladders (the rows round 2
# never produced), then the threshold and cube-size variants; hyper128
# runs last (BASELINE: cube128 ~= cube64, and its chunk-8 sweep is by far
# the slowest).
VARIANTS = [
    ("hyper64", "hyper", "voxception", None, None, "ladder", 150),
    ("factorized", "factorized", "voxception", None, None,
     "factorized_ladder", 130),
    ("factorized_simple", "factorized", "simple", None, None,
     "simple_ladder", 120),
    ("hyper32", "hyper", "voxception", 32, None, "ladder", 150),
    # same compiled programs as hyper64 (only the selector differs), so
    # its cold-compile share is near zero
    ("hyper_fixed", "hyper", "voxception", None, 0.0, "ladder", 120),
    ("hyper128", "hyper", "voxception", 128, None, "ladder", 240),
]

# (row label, variant A, variant B): BD of A vs B, negative = A wins.
# Matches the reference's reported comparisons (results.ipynb 68-110).
COMPARISONS = [
    ("cube64_vs_cube32", "hyper64", "hyper32"),
    ("cube128_vs_cube64", "hyper128", "hyper64"),
    ("adaptive_vs_fixed_thres", "hyper64", "hyper_fixed"),
    ("hyper_vs_factorized", "hyper64", "factorized"),
    ("voxception_vs_simple", "factorized", "factorized_simple"),
]


def run_ablations(args):
    ladders = {
        "ladder": [s for s in args.ladder.split(",") if s],
        "factorized_ladder": [s for s in (args.factorized_ladder or
                                          "").split(",") if s],
        "simple_ladder": [s for s in (args.simple_ladder or
                                      "").split(",") if s],
    }
    os.makedirs(args.out, exist_ok=True)
    deadline = float(getattr(args, "deadline", 0) or 0)
    csvs = {}
    for name, mode, model, cs, fixed, lkey, sec_per_pt in VARIANTS:
        cks = ladders[lkey]
        if not cks:
            print(f"[ablate] {name}: no checkpoints given, skipped")
            continue
        n_pts = len(cks) + len([s for s in getattr(
            args, "extra_scales", "").split(",") if s])
        est = n_pts * sec_per_pt + 120
        if deadline and time.time() + est > deadline:
            print(f"[ablate] {name}: skipped — est {est:.0f}s exceeds "
                  f"the {deadline - time.time():.0f}s left before "
                  f"--deadline (partial results beat a killed sweep)")
            continue
        cube_size = cs or args.cube_size
        # keep the partition density comparable across cube sizes: the
        # reference keeps min_num=64 for every variant
        extra = tuple(float(s) for s in getattr(
            args, "extra_scales", "").split(",") if s)
        cfg = variant_config(
            os.path.join(args.out, name + ".ini"), cks,
            cube_size=cube_size, min_num=args.min_num, fixed_thres=fixed,
            extra_scales=extra)
        # constant voxels-per-chunk across cube sizes (a 128^3 cube is 8x
        # the volume of a 64^3 one; a fixed cube count would blow HBM)
        chunk = max(1, int(args.chunk * (args.cube_size / cube_size) ** 3))
        if cube_size >= 128:
            # the voxel-matched chunk (12 at --chunk 96) compiled to 16.0G
            # of 15.75G HBM in the round-2 run (FAILED_R*.traceback.txt):
            # the fused decode pipeline's live set grows super-linearly in
            # cube volume, so give the 128^3 variant a 1/3 margin
            chunk = min(chunk, 8)
        print(f"[ablate] running {name} (mode={mode}, model={model}, "
              f"cube={cube_size}, chunk={chunk})")
        try:
            csvs[name] = _eval_variant(
                name, args.input, cfg, args.out, args.res, mode, model,
                chunk, args.dtype, search_rho=args.search_rho)
        except Exception as e:  # noqa: BLE001 — one variant must not kill
            import traceback
            print(f"[ablate] {name} FAILED: {e!r}\n"
                  f"{traceback.format_exc()}")
            # the harness flushes its CSV per rate point: salvage the
            # completed rows (the BD gates below decide if they suffice)
            base = os.path.splitext(os.path.basename(args.input))[0]
            partial = os.path.join(args.out, name, base + ".csv")
            if os.path.exists(partial):
                csvs[name] = partial

    rows = []
    for label, va, vb in COMPARISONS:
        if va not in csvs or vb not in csvs:
            continue
        try:
            row = {"comparison": label, "valid": True, "reason": ""}
            for dm in ("d1", "d2"):
                bd_r, bd_s, reason = _bd_pair(csvs[va], csvs[vb], dm)
                row[f"bdrate_{dm}_pct"] = bd_r
                row[f"bdsnr_{dm}_db"] = bd_s
                if reason:
                    row["valid"] = False
                    row["reason"] = f"{dm}: {reason}"
            rows.append(row)
            if row["valid"]:
                print(f"[ablate] {label}: "
                      f"D1 BD-rate {row['bdrate_d1_pct']:+.2f}%"
                      f"  D2 {row['bdrate_d2_pct']:+.2f}%")
            else:
                print(f"[ablate] {label}: NOT well-posed — {row['reason']}")
        except Exception as e:  # noqa: BLE001
            print(f"[ablate] {label} BD computation failed: {e!r}")
    if rows:
        import pandas as pd
        out_csv = os.path.join(args.out, "ablation_bd.csv")
        pd.DataFrame(rows).to_csv(out_csv, index=False)
        print(f"[ablate] wrote {out_csv}")
    return rows
