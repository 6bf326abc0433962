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
    skews the integral. This pruning is a local robustness choice of this
    repo (the reference fits the raw points, `myutils/bdrate_metrics.py`;
    its rho search, eval_ablation_studies.py:152-205, is a per-point
    sweep, not curve pruning) — we prune so that short or weakly
    separated ladders cannot feed a non-monotone curve to the polyfit."""
    pts = sorted((float(r), float(d)) for r, d in points
                 if np.isfinite(r) and np.isfinite(d) and r > 0)
    front, best = [], -np.inf
    for r, d in pts:
        if d > best:
            front.append((r, d))
            best = d
    return front


def bd_pair(curve_a, curve_b, min_points=3, min_overlap_db=0.3):
    """Gated BD-rate/BD-PSNR of curve A vs curve B (negative = A wins).

    Returns (bd_rate, bd_snr, reason): reason is None when the comparison
    is well-posed, else a string and the BD values are NaN. Gates (round-2
    and round-3 ADVICE — a +50,251% BD-rate over non-overlapping curves,
    and a silent no-overlap 0.0, must never land in a release artifact):
      - each curve must keep >= min_points after Pareto pruning;
      - the PSNR spans must overlap by >= min_overlap_db (the BD integral
        runs over the common quality interval; no overlap = extrapolation).
    """
    a = pareto_front(curve_a)
    b = pareto_front(curve_b)
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


def bd_table(codec_curves, anchor_curves, metric_tag="",
             min_points=3, min_overlap_db=0.3):
    """BD-rate/BD-PSNR of the codec vs each anchor, per sequence + average.

    Every pair goes through the same well-posedness gates as the ablation
    driver (``bd_pair``): ill-posed pairs yield NaN plus a human-readable
    ``invalid<tag> vs <anchor>`` reason column, and NaN rows are excluded
    from the average (pandas skipna) — never a fabricated 0.0.

    Args:
      codec_curves: {sequence: [(bpp, psnr), ...]}
      anchor_curves: {anchor_name: {sequence: [(bpp, psnr), ...]}}
      metric_tag: optional column-name suffix (e.g. "_d1") so D1 and D2
        tables can be joined side by side.

    Returns a pandas DataFrame (rows = sequences + 'average', columns =
    'bdrate<tag> vs <anchor>' / 'bdsnr<tag> vs <anchor>' [+ invalid...]).
    """
    import pandas as pd
    rows = {}
    for seq, curve in codec_curves.items():
        row = {}
        for aname, acurves in anchor_curves.items():
            if seq not in acurves:
                continue
            bd_r, bd_s, reason = bd_pair(
                curve, acurves[seq], min_points=min_points,
                min_overlap_db=min_overlap_db)
            row[f"bdrate{metric_tag} vs {aname}"] = bd_r
            row[f"bdsnr{metric_tag} vs {aname}"] = bd_s
            if reason:
                row[f"invalid{metric_tag} vs {aname}"] = reason
        rows[seq] = row
    df = pd.DataFrame(rows).T
    if len(df) and len(df.columns):
        # reason columns make the frame object-dtyped; coerce the BD
        # columns back to float so the average is well-defined
        for col in df.columns:
            if not col.startswith("invalid"):
                df[col] = pd.to_numeric(df[col], errors="coerce")
        num = df.select_dtypes(include="number")
        df.loc["average"] = num.mean()  # skipna: NaN pairs excluded
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


def curve_spans_md(codec_curves, anchor_curves):
    """Markdown table of each curve's rate/quality span per sequence.

    BD-rate integrates over the COMMON quality interval only, so a pair's
    sign can invert with the interval: e.g. G-PCC trisoup on perfectly
    smooth mesh-sampled content dominates below its quality ceiling but
    *saturates* there (more bits stop buying quality), and the learned
    codec's top rungs live above that ceiling where no comparison is
    possible. Publishing the spans next to the BD numbers keeps the
    interval limitation visible instead of letting a single percentage
    stand in for the whole R-D relationship.
    """
    lines = ["| sequence | curve | bpp span | D1 span (dB) |",
             "|:--|:--|--:|--:|"]
    for seq, curve in codec_curves.items():
        rows = [("learned", curve)]
        for aname, acurves in anchor_curves.items():
            if seq in acurves:
                rows.append((aname, acurves[seq]))
        for name, pts in rows:
            front = pareto_front(pts)
            if not front:
                continue
            lines.append(
                f"| {seq} | {name} | {front[0][0]:.3f}-{front[-1][0]:.3f} "
                f"| {front[0][1]:.1f}-{front[-1][1]:.1f} |")
    return "\n".join(lines)


def write_published_context(published_csv, our_bd, out_md, extra_md=""):
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
        f.write("## Measured here (this framework vs its anchors: native "
                "octree; MPEG TMC13 octree/trisoup when the binary runs)"
                "\n\n")
        f.write(our_bd.round(2).to_markdown() + "\n\n")
        if extra_md:
            f.write("## Curve spans (BD integrates the COMMON quality "
                    "interval only — anchors that saturate below the "
                    "codec's top rungs are compared inside their "
                    "reachable band)\n\n")
            f.write(extra_md + "\n\n")
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
    """Octree-anchor R-D curves for one input cloud, cached on disk.

    Returns {"d1": [(bpp, d1_psnr), ...], "d2": [(bpp, d2_psnr), ...]}.

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
           f"_{st.st_size}_{int(st.st_mtime)}_v2")
    cache_dir = os.path.join(eval_dir, "anchor_cache")
    os.makedirs(cache_dir, exist_ok=True)
    cache_path = os.path.join(
        cache_dir, key.replace("/", "_").replace(" ", "") + ".json")
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cached = json.load(f)
        return {m: [tuple(p) for p in pts_] for m, pts_ in cached.items()}
    pts, normals = load_ply_with_normals(ply)
    if normals is None:
        normals = estimate_normals(pts)
    rows = anchors.rd_curve(pts.astype(np.int64), normals,
                            seq_res, scales=anchor_scales,
                            shifts=anchor_shifts)
    curves = {"d1": [(r["bpp"], r["d1_psnr"]) for r in rows],
              "d2": [(r["bpp"], r["d2_psnr"]) for r in rows
                     if "d2_psnr" in r]}
    with open(cache_path, "w") as f:
        json.dump(curves, f)
    return curves


def gpcc_curve_cached(ply, seq_res, eval_dir, qscales=(),
                      trisoup_log2s=(), tag="gpcc"):
    """G-PCC anchor curves via the MPEG TMC13 binary, cached on disk.

    Drives either role (octree ``qscales`` / trisoup ``trisoup_log2s`` —
    the reference's published tables compare PCGCv1 against both) and
    scores with the same pc_error as every other curve. Returns
    {"d1": [...], "d2": [...]} or None when no TMC13 binary is on the
    host (codec/gpcc.py). Pass >=3 rungs per role — `bd_pair` gates out
    shorter curves.
    """
    import json
    from pcgcv1_tpu.codec import gpcc
    from pcgcv1_tpu.metrics import estimate_normals
    from pcgcv1_tpu.ops import load_ply_with_normals

    if not gpcc.available():
        return None
    st = os.stat(ply)
    # the key covers the TMC13 binary identity too (size+mtime of the
    # resolved PCGC_TMC3 path): a different tmc3 build must not be served
    # a stale anchor curve (round-4 ADVICE)
    bst = os.stat(gpcc.binary())
    key = (f"{os.path.basename(ply)}_res{seq_res}_{tag}"
           f"_q{tuple(qscales)}_t{tuple(trisoup_log2s)}"
           f"_{st.st_size}_{int(st.st_mtime)}"
           f"_b{bst.st_size}.{int(bst.st_mtime)}_v1")
    cache_dir = os.path.join(eval_dir, "anchor_cache")
    os.makedirs(cache_dir, exist_ok=True)
    cache_path = os.path.join(
        cache_dir, key.replace("/", "_").replace(" ", "") + ".json")
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cached = json.load(f)
        return {m: [tuple(p) for p in pts_] for m, pts_ in cached.items()}
    pts, normals = load_ply_with_normals(ply)
    if normals is None:
        normals = estimate_normals(pts)
    rows = gpcc.rd_curve(pts.astype(np.int64), normals, seq_res,
                         qscales=qscales, trisoup_log2s=trisoup_log2s)
    curves = {"d1": [(r["bpp"], r["d1_psnr"]) for r in rows],
              "d2": [(r["bpp"], r["d2_psnr"]) for r in rows]}
    with open(cache_path, "w") as f:
        json.dump(curves, f)
    return curves


def run_report(eval_dir, out_path, anchor_scales=(0.875, 0.75),
               inputs_dir=None, resolution=1024, published_csv=None,
               anchor_shifts=(1, 2, 3, 4), trisoup_log2s=(2, 3, 4),
               gpcc_qscales=(0.125, 0.25, 0.5, 0.75, 0.875)):
    """CLI driver: read all CSVs in eval_dir, compute octree-anchor curves
    for the matching input PLYs when available, emit a gated BD-rate table
    (CSV, D1 and D2 side by side) and comparison plots.

    The anchor ladder merges G-PCC-style octree depth truncation
    (``anchor_shifts``; qscale = 2^-shift, covering the low-rate regime)
    with fractional rescale points (``anchor_scales``; covering
    63 dB..lossless at vox10 so the comparison interval overlaps the
    trained codec's operating range — without them BD-rate vs the anchor
    is extrapolation and the gates in ``bd_pair`` reject it)."""
    import glob
    import pandas as pd

    codec_curves = {"d1": {}, "d2": {}}
    anchor_curves = {"d1": {"octree": {}}, "d2": {"octree": {}}}
    for csv in sorted(glob.glob(os.path.join(eval_dir, "*.csv"))):
        seq = os.path.splitext(os.path.basename(csv))[0]
        if seq.endswith("_bd"):
            continue
        try:
            for m in ("d1", "d2"):
                codec_curves[m][seq] = load_rd_csv(csv, m)
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
            acurves = anchor_curve_cached(
                ply, seq_res, eval_dir, anchor_scales, anchor_shifts)
            for m in ("d1", "d2"):
                if acurves.get(m):
                    anchor_curves[m]["octree"][seq] = acurves[m]
            overlay = {"learned": codec_curves["d1"][seq],
                       "octree anchor": acurves["d1"]}
            # the real MPEG codec in both its roles, when the binary runs
            # on this host (reference results.ipynb compares against both)
            for aname, label, kw in (
                    ("gpcc-octree", "G-PCC octree (tmc3)",
                     {"qscales": gpcc_qscales}),
                    ("gpcc-trisoup", "G-PCC trisoup (tmc3)",
                     {"trisoup_log2s": trisoup_log2s})):
                if not list(kw.values())[0]:
                    continue
                try:
                    gcurves = gpcc_curve_cached(
                        ply, seq_res, eval_dir, tag=aname, **kw)
                except Exception as e:  # noqa: BLE001
                    # the MPEG binary choking on one cloud (degenerate/
                    # tiny inputs) must not kill the whole report — the
                    # native anchor column still stands
                    print(f"{aname} anchor failed on {seq}: "
                          f"{type(e).__name__}: {e}")
                    gcurves = None
                if gcurves:
                    for m in ("d1", "d2"):
                        if gcurves.get(m):
                            anchor_curves[m].setdefault(
                                aname, {})[seq] = gcurves[m]
                    overlay[label] = gcurves["d1"]
            compare_plot(
                overlay,
                os.path.join(eval_dir, seq + "_vs_anchor.png"), seq)
    df = bd_table(codec_curves["d1"], anchor_curves["d1"],
                  metric_tag="_d1").join(
        bd_table(codec_curves["d2"], anchor_curves["d2"],
                 metric_tag="_d2"))
    df.to_csv(out_path)
    if published_csv is None:
        cand = os.path.join(eval_dir, os.pardir, "reference_published",
                            "bdrates.csv")
        published_csv = cand if os.path.exists(cand) else ""
    if published_csv:
        write_published_context(
            published_csv, df,
            os.path.splitext(out_path)[0] + "_context.md",
            extra_md=curve_spans_md(codec_curves["d1"], anchor_curves["d1"]))
    return df
