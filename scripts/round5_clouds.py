"""Round-5 release-cloud refresh: true mesh normals + a scan-realistic
fourth sequence (round-4 VERDICT items 3 and 4).

1. composite_vox10 / revolution_vox10: replay make_corpus.gen_eval_clouds'
   exact rng sequence (seed 777, spec order blob -> composite ->
   revolution -> composite_vox8) with return_normals=True — the sampled
   points are bit-identical (normals are derived from face geometry, no
   extra rng draws) — and rewrite the artifacts with per-voxel unit mesh
   normals. D1/bpp numbers from earlier sweeps stay comparable; only D2
   scoring changes (true normals instead of k-NN estimates).
2. synth_vox10: same geometry as bench._workload (seed 0), with ANALYTIC
   surface normals (the sheet is parametric; d r/du x d r/dv at each
   sample's (u, v); the additive sensor noise does not change the
   ground-truth surface orientation).
3. scan_vox10 (NEW): held-out composite figure at a fresh seed with
   datagen.apply_scan_noise — ~0.8-voxel depth noise, 3-view coverage,
   occlusion holes, low-frequency density waves. This is the content
   class where G-PCC trisoup's plane fit degrades (the reference's
   flagship trisoup win is on scanned humans, results.ipynb cell 24).

Each rewrite is identity-checked against the existing artifact before
overwriting; a mismatch aborts loudly.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_corpus import (mesh_blob, mesh_composite,  # noqa: E402
                         mesh_revolution)
from pcgcv1_tpu.ops import load_ply, write_ply  # noqa: E402
from pcgcv1_tpu.training.datagen import (apply_scan_noise,  # noqa: E402
                                         random_rotation,
                                         sample_mesh_points)

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts")


def check_identity(path, qpts):
    if not os.path.exists(path):
        print(f"[clouds] {path}: no existing artifact, writing fresh")
        return
    old = np.asarray(load_ply(path), np.int64)
    new = np.asarray(qpts, np.int64)
    if old.shape != new.shape or not np.array_equal(
            np.sort(old.ravel()), np.sort(new.ravel())) \
            or not np.array_equal(old, new):
        raise SystemExit(f"IDENTITY MISMATCH for {path}: regenerated "
                         f"{new.shape} vs existing {old.shape} — aborting "
                         f"(rng replay is broken; do NOT overwrite)")
    print(f"[clouds] {path}: identity verified ({len(new)} pts)")


def mesh_eval_clouds():
    """Replay gen_eval_clouds (make_corpus.py) with normals."""
    rng = np.random.default_rng(777)
    specs = [("eval_blob_vox10", mesh_blob, 1023, 6_000_000, None),
             ("eval_composite_vox10", mesh_composite, 1023, 6_000_000,
              "composite_vox10.ply"),
             ("eval_revolution_vox10", mesh_revolution, 1023, 6_000_000,
              "revolution_vox10.ply"),
             ("eval_composite_vox8", mesh_composite, 255, 500_000, None)]
    for name, fam, res, npts, out in specs:
        verts, faces = fam(rng)
        pts, nrm = sample_mesh_points(verts, faces, npts, rng,
                                      return_normals=True)
        rot = random_rotation(rng)
        pts = pts @ rot.T
        nrm = nrm @ rot.T
        pts = pts - pts.min(axis=0)
        pts = pts * (res / pts.max())
        qpts, idx = np.unique(np.round(pts), axis=0, return_index=True)
        qpts = qpts.astype(np.int32)
        if out is None:
            continue
        path = os.path.join(ART, out)
        check_identity(path, qpts)
        write_ply(path, qpts, normals=nrm[idx])
        print(f"[clouds] wrote {path} with normals", flush=True)


def synth_cloud(n_target=860_000, res=1024, seed=0):
    """bench._workload geometry + analytic sheet normals."""
    rng = np.random.default_rng(seed)
    n = int(n_target * 1.4)
    u = rng.uniform(0, 1, n)
    v = rng.uniform(0, 1, n)
    x = 300 + 220 * u + 60 * np.sin(6.28 * v)
    y = 1000 * v
    z = 400 + 150 * np.sin(3.1 * u + 2.0 * v) + 90 * u
    pts = np.stack([x, y, z], 1) + rng.normal(0, 1.2, (n, 3))
    # d r/du = (220, 0, 465 cos(w) + 90), d r/dv = (376.8 cos(6.28 v),
    # 1000, 300 cos(w)), w = 3.1 u + 2 v
    w = 3.1 * u + 2.0 * v
    ru = np.stack([np.full(n, 220.0), np.zeros(n),
                   150 * 3.1 * np.cos(w) + 90], 1)
    rv = np.stack([60 * 6.28 * np.cos(6.28 * v), np.full(n, 1000.0),
                   150 * 2.0 * np.cos(w)], 1)
    nrm = np.cross(ru, rv)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    qpts_f = np.clip(np.round(pts), 0, res - 1)
    qpts, idx = np.unique(qpts_f, axis=0, return_index=True)
    qpts = qpts.astype(np.int32)
    path = os.path.join(ART, "synth_vox10.ply")
    check_identity(path, qpts)
    write_ply(path, qpts, normals=nrm[idx])
    print(f"[clouds] wrote {path} with analytic normals", flush=True)


def scan_cloud(seed=20260821, res=1023, npts=3_500_000):
    rng = np.random.default_rng(seed)
    verts, faces = mesh_composite(rng)
    pts, nrm = sample_mesh_points(verts, faces, npts, rng,
                                  return_normals=True)
    rot = random_rotation(rng)
    pts = pts @ rot.T
    nrm = nrm @ rot.T
    pts = pts - pts.min(axis=0)
    pts = pts * (res / pts.max())
    pts, nrm = apply_scan_noise(pts, nrm, rng, jitter=0.8, n_views=3,
                                backface_keep=0.15, holes=16,
                                hole_radius=0.015)
    pts = np.clip(pts, 0, res)
    qpts, idx = np.unique(np.round(pts), axis=0, return_index=True)
    qpts = qpts.astype(np.int32)
    path = os.path.join(ART, "scan_vox10.ply")
    write_ply(path, qpts, normals=nrm[idx])
    print(f"[clouds] wrote {path}: {len(qpts)} pts (from {npts} samples)",
          flush=True)


if __name__ == "__main__":
    mesh_eval_clouds()
    synth_cloud()
    scan_cloud()
