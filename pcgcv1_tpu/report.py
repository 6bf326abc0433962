"""R-D comparison reports: BD-rate tables against anchors.

Capability parity with the reference's `results.ipynb`: collect per-sequence
R-D CSVs (from `evalharness`), optionally compute anchor curves (our octree
codec in the G-PCC-octree role, `codec/anchors.py`), and produce BD-rate /
BD-PSNR tables plus comparison figures.
"""

from __future__ import annotations

import os

import numpy as np

from pcgcv1_tpu.metrics import bdrate, bdsnr


def load_rd_csv(path, d_metric="d1"):
    """CSV from evalharness -> [(bpp, psnr), ...] sorted by rate."""
    import pandas as pd
    df = pd.read_csv(path).sort_values("bpp")
    return list(zip(df["bpp"], df[f"{d_metric}_psnr"]))


def pareto_front(points):
    """Prune an R-D point list to its Pareto front: finite points only,
    sorted by rate, each successive point must improve quality.

    The BD polyfit runs over PSNR-as-abscissa, so a rate ladder with
    dominated rungs (more bits, no more quality) is a non-function and
    skews the integral; every curve entering a BD computation goes
    through this first (the reference reports its optimal-rho convex
    hull the same way, eval_ablation_studies.py:152-205)."""
    pts = sorted((float(r), float(d)) for r, d in points
                 if np.isfinite(r) and np.isfinite(d) and r > 0)
    front, best = [], -np.inf
    for r, d in pts:
        if d > best:
            front.append((r, d))
            best = d
    return front


def bd_table(codec_curves, anchor_curves, d_metric="d1"):
    """BD-rate/BD-PSNR of the codec vs each anchor, per sequence + average.

    Args:
      codec_curves: {sequence: [(bpp, psnr), ...]}
      anchor_curves: {anchor_name: {sequence: [(bpp, psnr), ...]}}

    Returns a pandas DataFrame (rows = sequences + 'average', columns =
    'bdrate vs <anchor>' / 'bdsnr vs <anchor>').
    """
    import pandas as pd
    rows = {}
    for seq, curve in codec_curves.items():
        row = {}
        for aname, acurves in anchor_curves.items():
            if seq not in acurves:
                continue
            finite = pareto_front(acurves[seq])
            cfin = pareto_front(curve)
            if len(finite) < 2 or len(cfin) < 2:
                continue
            row[f"bdrate vs {aname}"] = bdrate(finite, cfin)
            row[f"bdsnr vs {aname}"] = bdsnr(finite, cfin)
        rows[seq] = row
    df = pd.DataFrame(rows).T
    if len(df) and len(df.columns):
        df.loc["average"] = df.mean()
    return df


def compare_plot(curves, path, title="", d_label="D1 PSNR (dB)"):
    """Overlayed R-D curves: {name: [(bpp, psnr), ...]}."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6.5, 4.5))
    for name, curve in curves.items():
        curve = [(r, p) for r, p in sorted(curve) if np.isfinite(p)]
        if not curve:
            continue
        ax.plot([c[0] for c in curve], [c[1] for c in curve], "o-",
                label=name)
    ax.set_xlabel("bits per point")
    ax.set_ylabel(d_label)
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def write_published_context(published_csv, our_bd, out_md):
    """Fold the reference's *published* anchor comparisons into the report.

    The reference's `results.ipynb` (cells 22-26) reports BD-rates of
    PCGCv1 against G-PCC octree/trisoup, PCL, and V-PCC on 14 sequences.
    Those anchors don't run here (no 8iVFB/MVUB/Owlii data ships with
    either repo), so the published numbers are imported as static context
    next to our *measured* BD-rate against our own octree anchor —
    clearly labeled so the two are never conflated.
    """
    import pandas as pd
    pub = pd.read_csv(published_csv)
    per_ds = pub.groupby("dataset").mean(numeric_only=True).round(2)
    overall = pub.mean(numeric_only=True).round(2)
    with open(out_md, "w") as f:
        f.write("# BD-rate context\n\n")
        f.write("## Measured here (this framework vs its own octree "
                "anchor, synthetic eval cloud)\n\n")
        f.write(our_bd.round(2).to_markdown() + "\n\n")
        f.write("## Published by the reference (results.ipynb cells "
                "22-26; PCGCv1 vs MPEG anchors on 8iVFB/MVUB/Owlii — "
                "static import, NOT measured in this repo)\n\n")
        f.write(per_ds.to_markdown() + "\n\n")
        f.write("overall means: "
                + ", ".join(f"{k}={v}" for k, v in overall.items())
                + "\n")
    return out_md


def anchor_curve_cached(ply, seq_res, eval_dir, anchor_scales=None,
                        anchor_shifts=(1, 2, 3, 4)):
    """Octree-anchor R-D curve for one input cloud, cached on disk.

    Anchor curves are pure functions of (cloud, res, ladder) and expensive
    (native octree + pc_error per rate point; minutes on multi-M-point
    clouds), so they are cached under ``<eval_dir>/anchor_cache`` keyed by
    the cloud's identity (name+size+mtime) and the ladder parameters.
    Mode-tagged CSVs sharing a cloud (house_vox12 / house_vox12_f) hit the
    same entry; a warm pass before a deadline-bounded report makes the
    report itself near-instant."""
    import json
    from pcgcv1_tpu.codec import anchors
    from pcgcv1_tpu.metrics import estimate_normals
    from pcgcv1_tpu.ops import load_ply_with_normals

    st = os.stat(ply)
    key = (f"{os.path.basename(ply)}_res{seq_res}"
           f"_sc{anchor_scales}_sh{tuple(anchor_shifts)}"
           f"_{st.st_size}_{int(st.st_mtime)}")
    cache_dir = os.path.join(eval_dir, "anchor_cache")
    os.makedirs(cache_dir, exist_ok=True)
    cache_path = os.path.join(
        cache_dir, key.replace("/", "_").replace(" ", "") + ".json")
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return [tuple(p) for p in json.load(f)]
    pts, normals = load_ply_with_normals(ply)
    if normals is None:
        normals = estimate_normals(pts)
    rows = anchors.rd_curve(pts.astype(np.int64), normals,
                            seq_res, scales=anchor_scales,
                            shifts=anchor_shifts)
    curve = [(r["bpp"], r["d1_psnr"]) for r in rows]
    with open(cache_path, "w") as f:
        json.dump(curve, f)
    return curve


def run_report(eval_dir, out_path, anchor_scales=None,
               inputs_dir=None, resolution=1024, published_csv=None,
               anchor_shifts=(1, 2, 3, 4)):
    """CLI driver: read all CSVs in eval_dir, compute octree-anchor curves
    for the matching input PLYs when available, emit BD-rate table (CSV)
    and comparison plots.

    The anchor curve defaults to G-PCC-style octree depth truncation
    (``anchor_shifts``; qscale = 2^-shift). Passing ``anchor_scales``
    switches to the round-2 rescale ladder instead."""
    import glob
    import pandas as pd

    codec_curves = {}
    anchor_curves = {"octree": {}}
    for csv in sorted(glob.glob(os.path.join(eval_dir, "*.csv"))):
        seq = os.path.splitext(os.path.basename(csv))[0]
        if seq.endswith("_bd"):
            continue
        try:
            codec_curves[seq] = load_rd_csv(csv)
        except KeyError:
            # not an R-D CSV (e.g. a previously written BD table living
            # in the same directory) — skip, don't crash the report
            continue
        ply = (os.path.join(inputs_dir, seq + ".ply")
               if inputs_dir else None)
        if ply and not os.path.exists(ply) and "_" in seq:
            # mode-tagged CSVs (e.g. house_vox12_f) share the input cloud
            ply = os.path.join(inputs_dir, seq.rsplit("_", 1)[0] + ".ply")
        if ply and os.path.exists(ply):
            # voxN sequence names carry their own peak resolution (the
            # vox12 multi-scale artifact must not be scored at res 1024)
            seq_res = resolution
            for tok in seq.split("_"):
                if tok.startswith("vox") and tok[3:].isdigit():
                    seq_res = 2 ** int(tok[3:])
            anchor_curves["octree"][seq] = anchor_curve_cached(
                ply, seq_res, eval_dir, anchor_scales, anchor_shifts)
            compare_plot(
                {"learned": codec_curves[seq],
                 "octree anchor": anchor_curves["octree"][seq]},
                os.path.join(eval_dir, seq + "_vs_anchor.png"), seq)
    df = bd_table(codec_curves, anchor_curves)
    df.to_csv(out_path)
    if published_csv is None:
        cand = os.path.join(eval_dir, os.pardir, "reference_published",
                            "bdrates.csv")
        published_csv = cand if os.path.exists(cand) else ""
    if published_csv:
        write_published_context(
            published_csv, df,
            os.path.splitext(out_path)[0] + "_context.md")
    return df
