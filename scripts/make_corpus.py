"""Build a diversified training corpus of 64^3 occupancy cubes.

Round-1's synthetic quadric-sheet corpus limited R-D generalization
(VERDICT.md "What's weak" #1): every cube was a noisy height-field sheet,
so the alpha ladder collapsed on held-out data. This generator plays the
role of the reference's ShapeNet pipeline (`dataprocess/mesh2pc.py` sample
-> rotate -> voxelize; `generate_dataset.py` partition -> shuffle) using
procedurally generated *watertight-ish triangle meshes* from six families
(superellipsoids, tori, surfaces of revolution, terrains, displaced-sphere
blobs, and multi-primitive composites), sampled densely onto voxel grids
at mixed resolutions. The resulting cubes look like real scan cubes:
smooth dense 2D manifolds with curvature, creases, junctions, and
multi-surface interactions -- not random noise sheets.

Usage:
  python scripts/make_corpus.py --out data/corpus --target_cubes 120000
  python scripts/make_corpus.py --eval_clouds artifacts/eval  # held-out
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcgcv1_tpu.ops import partition, ply  # noqa: E402
from pcgcv1_tpu.training.datagen import (  # noqa: E402
    random_rotation, sample_mesh_points)


# ------------------------------ mesh builders --------------------------------

def grid_mesh(P, wrap_u=False, wrap_v=False):
    """Parametric grid [nu,nv,3] -> (verts, faces) with quad triangulation."""
    nu, nv = P.shape[:2]
    verts = P.reshape(-1, 3)
    iu = np.arange(nu if wrap_u else nu - 1)
    iv = np.arange(nv if wrap_v else nv - 1)
    ii, jj = np.meshgrid(iu, iv, indexing="ij")
    a = ii * nv + jj
    b = ((ii + 1) % nu) * nv + jj
    c = ((ii + 1) % nu) * nv + (jj + 1) % nv
    d = ii * nv + (jj + 1) % nv
    f1 = np.stack([a, b, c], -1).reshape(-1, 3)
    f2 = np.stack([a, c, d], -1).reshape(-1, 3)
    return verts, np.concatenate([f1, f2]).astype(np.int64)


def _spow(x, e):
    return np.sign(x) * np.abs(x) ** e


def mesh_superellipsoid(rng, n=96):
    e1, e2 = rng.uniform(0.3, 2.2, 2)
    s = rng.uniform(0.4, 1.0, 3)
    u = np.linspace(-np.pi / 2, np.pi / 2, n)
    v = np.linspace(-np.pi, np.pi, n, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    P = np.stack([
        s[0] * _spow(np.cos(uu), e1) * _spow(np.cos(vv), e2),
        s[1] * _spow(np.cos(uu), e1) * _spow(np.sin(vv), e2),
        s[2] * _spow(np.sin(uu), e1)], -1)
    return grid_mesh(P, wrap_v=True)


def mesh_torus(rng, n=96):
    R = rng.uniform(0.5, 1.0)
    r = rng.uniform(0.12, 0.45) * R
    k = rng.integers(0, 5)
    amp = rng.uniform(0, 0.3)
    u = np.linspace(0, 2 * np.pi, n, endpoint=False)
    v = np.linspace(0, 2 * np.pi, n, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    rr = r * (1 + amp * np.sin(k * uu))
    P = np.stack([(R + rr * np.cos(vv)) * np.cos(uu),
                  (R + rr * np.cos(vv)) * np.sin(uu),
                  rr * np.sin(vv)], -1)
    return grid_mesh(P, wrap_u=True, wrap_v=True)


def mesh_revolution(rng, n=96):
    t = np.linspace(0, 1, n)
    prof = rng.uniform(0.25, 0.6) * np.ones(n)
    for i in range(1, 5):
        prof += rng.normal(0, 0.25 / i) * np.sin(
            i * np.pi * t + rng.uniform(0, 2 * np.pi))
    prof = np.clip(prof, 0.03, 1.2)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    tt, hh = np.meshgrid(t, th, indexing="ij")
    pp = prof[:, None]
    P = np.stack([pp * np.cos(hh), pp * np.sin(hh),
                  (tt - 0.5) * rng.uniform(1.0, 2.0)], -1)
    return grid_mesh(P, wrap_v=True)


def mesh_terrain(rng, n=128):
    x = np.linspace(-1, 1, n)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    zz = np.zeros_like(xx)
    for _ in range(rng.integers(3, 8)):
        fx, fy = rng.uniform(0.5, 4.0, 2)
        zz += rng.normal(0, 0.25) * np.sin(
            np.pi * (fx * xx + rng.uniform(0, 2))) * np.sin(
            np.pi * (fy * yy + rng.uniform(0, 2)))
    P = np.stack([xx, yy, 0.5 * zz], -1)
    return grid_mesh(P)


def mesh_blob(rng, n=96):
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    r = np.ones_like(tt)
    for _ in range(rng.integers(2, 6)):
        kt, kp = rng.integers(1, 5, 2)
        r += rng.normal(0, 0.15) * np.sin(kt * tt + rng.uniform(0, 6)) \
            * np.cos(kp * pp + rng.uniform(0, 6))
    r = np.clip(r, 0.2, 2.0)
    P = np.stack([r * np.sin(tt) * np.cos(pp),
                  r * np.sin(tt) * np.sin(pp),
                  r * np.cos(tt)], -1)
    return grid_mesh(P, wrap_v=True)


_PRIMS = [mesh_superellipsoid, mesh_torus, mesh_revolution, mesh_blob]


def mesh_composite(rng, n=64):
    verts, faces = [], []
    off = 0
    for _ in range(rng.integers(2, 5)):
        v, f = _PRIMS[rng.integers(len(_PRIMS))](rng, n)
        v = v * rng.uniform(0.3, 1.0)
        v = v @ random_rotation(rng).T + rng.uniform(-0.8, 0.8, 3)
        verts.append(v)
        faces.append(f + off)
        off += len(v)
    return np.concatenate(verts), np.concatenate(faces)


FAMILIES = [mesh_superellipsoid, mesh_torus, mesh_revolution,
            mesh_terrain, mesh_blob, mesh_composite, mesh_composite]


# ------------------------------ cloud sampling -------------------------------

def make_cloud(rng, resolution, n_points):
    fam = FAMILIES[rng.integers(len(FAMILIES))]
    verts, faces = fam(rng)
    pts = sample_mesh_points(verts, faces, n_points, rng)
    pts = pts @ random_rotation(rng).T
    pts = pts - pts.min(axis=0)
    extent = pts.max()
    if extent > 0:
        pts = pts * (resolution / extent)
    return np.unique(np.round(pts), axis=0).astype(np.int32), fam.__name__


def gen_corpus(out_dir, target_cubes, seed, deadline_s=None,
               cubes_per_shard=8192):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    buf, n_done, n_clouds, shard_i = [], 0, 0, 0
    fam_counts = {}
    t0 = time.time()

    def flush():
        nonlocal buf, shard_i
        if not buf:
            return
        offsets = np.zeros(len(buf) + 1, np.int64)
        offsets[1:] = np.cumsum([len(c) for c in buf])
        np.savez_compressed(
            os.path.join(out_dir, f"shard_{shard_i:05d}.npz"),
            points=np.concatenate(buf).astype(np.int16), offsets=offsets)
        shard_i += 1
        buf = []

    while n_done < target_cubes:
        if deadline_s and time.time() - t0 > deadline_s:
            print(f"[corpus] deadline hit at {n_done} cubes")
            break
        u = rng.random()
        res = 255 if u < 0.6 else (383 if u < 0.85 else 511)
        npts = int(400_000 * (res / 255) ** 2)
        pts, fam = make_cloud(rng, res, npts)
        n_clouds += 1
        fam_counts[fam] = fam_counts.get(fam, 0) + 1
        try:
            local, ids, positions, _ = partition.partition_points(
                pts, 64, 20)
        except ValueError:
            continue
        # shuffle cube order within the cloud so shards mix families
        order = rng.permutation(len(positions))
        for i in order:
            buf.append(local[ids == i].astype(np.int16))
        n_done += len(positions)
        if len(buf) >= cubes_per_shard:
            flush()
        if n_clouds % 50 == 0:
            dt = time.time() - t0
            print(f"[corpus] {n_clouds} clouds, {n_done} cubes, "
                  f"{dt:.0f}s ({n_done / dt:.1f} cubes/s)", flush=True)
    flush()
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"cubes": n_done, "clouds": n_clouds, "seed": seed,
                   "families": fam_counts}, f, indent=1)
    print(f"[corpus] done: {n_done} cubes / {n_clouds} clouds "
          f"in {time.time() - t0:.0f}s")
    return n_done


def gen_eval_clouds(out_dir, seed=777):
    """Held-out full clouds at vox10 scale for R-D eval (the role of
    longdress_vox10 in the reference demo/eval)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    specs = [("eval_blob_vox10", mesh_blob, 1023, 6_000_000),
             ("eval_composite_vox10", mesh_composite, 1023, 6_000_000),
             ("eval_revolution_vox10", mesh_revolution, 1023, 6_000_000),
             ("eval_composite_vox8", mesh_composite, 255, 500_000)]
    for name, fam, res, npts in specs:
        verts, faces = fam(rng)
        pts = sample_mesh_points(verts, faces, npts, rng)
        pts = pts @ random_rotation(rng).T
        pts = pts - pts.min(axis=0)
        pts = pts * (res / pts.max())
        pts = np.unique(np.round(pts), axis=0).astype(np.int32)
        path = os.path.join(out_dir, name + ".ply")
        ply.write_ply(path, pts)
        print(f"[eval] {path}: {len(pts)} points @ res {res}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/corpus")
    ap.add_argument("--target_cubes", type=int, default=120_000)
    ap.add_argument("--seed", type=int, default=20260817)
    ap.add_argument("--deadline_s", type=int, default=2700)
    ap.add_argument("--eval_clouds", default="",
                    help="if set, generate held-out eval clouds here "
                         "instead of training shards")
    args = ap.parse_args()
    if args.eval_clouds:
        gen_eval_clouds(args.eval_clouds)
    else:
        gen_corpus(args.out, args.target_cubes, args.seed,
                   deadline_s=args.deadline_s)
