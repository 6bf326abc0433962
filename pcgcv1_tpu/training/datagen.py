"""Dataset generation: meshes -> point clouds -> per-cube training shards.

Capability parity with the reference's dataset tooling:
- `dataprocess/mesh2pc.py` / `mesh2pc_open3d.py`: sample ~4e5 points per
  mesh surface, random rotation (QR of a Gaussian), normalize to a voxel
  grid, round + dedupe. The reference depends on pyntcloud/open3d; this is
  a dependency-free numpy implementation (area-weighted triangle sampling)
  reading OBJ/OFF/PLY triangle meshes.
- `generate_dataset.py`: partition clouds into cubes (min_num filter) and
  write shuffled per-cube training data. Output here is the packed .npz
  shard format of `training.data` (plus optional reference-style h5).
"""

from __future__ import annotations

import glob
import os
import random

import numpy as np

from pcgcv1_tpu.ops import partition, ply


# ----------------------------- mesh loading ---------------------------------

def load_mesh(path):
    """Load a triangle mesh -> (vertices float64 [V,3], faces int64 [F,3])."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return _load_obj(path)
    if ext == ".off":
        return _load_off(path)
    if ext == ".ply":
        return _load_ply_mesh(path)
    raise ValueError(f"unsupported mesh format {ext!r}")


def _load_obj(path):
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(t[1]), float(t[2]), float(t[3])])
            elif t[0] == "f":
                idx = [int(w.split("/")[0]) - 1 for w in t[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def _load_off(path):
    with open(path) as f:
        header = f.readline().strip()
        if header == "OFF":
            counts = f.readline().split()
        elif header.startswith("OFF"):
            counts = header[3:].split()
        else:
            raise ValueError("not an OFF file")
        nv, nf = int(counts[0]), int(counts[1])
        verts = np.array([[float(x) for x in f.readline().split()[:3]]
                          for _ in range(nv)])
        faces = []
        for _ in range(nf):
            t = [int(x) for x in f.readline().split()]
            for k in range(2, t[0]):
                faces.append([t[1], t[k], t[k + 1]])
    return verts, np.asarray(faces, np.int64)


_PLY_SCALARS = {
    b"char": "i1", b"int8": "i1", b"uchar": "u1", b"uint8": "u1",
    b"short": "i2", b"int16": "i2", b"ushort": "u2", b"uint16": "u2",
    b"int": "i4", b"int32": "i4", b"uint": "u4", b"uint32": "u4",
    b"float": "f4", b"float32": "f4", b"double": "f8", b"float64": "f8",
}


def _load_ply_mesh(path):
    """PLY triangle mesh (ASCII or binary_little_endian) -> (verts, faces).

    The reference samples PLY meshes via pyntcloud
    (`dataprocess/mesh2pc.py:56-89`); this is the dependency-free
    equivalent. Vertex properties beyond x/y/z are skipped; face list
    properties fan-triangulate.
    """
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype | ('list', ct, it))])
        while True:
            tokens = f.readline().strip().split()
            if not tokens:
                continue
            if tokens[0] == b"format":
                fmt = tokens[1].decode()
            elif tokens[0] == b"element":
                elements.append([tokens[1], int(tokens[2]), []])
            elif tokens[0] == b"property":
                if tokens[1] == b"list":
                    elements[-1][2].append(
                        (tokens[-1], ("list", _PLY_SCALARS[tokens[2]],
                                      _PLY_SCALARS[tokens[3]])))
                else:
                    elements[-1][2].append(
                        (tokens[-1], _PLY_SCALARS[tokens[1]]))
            elif tokens[0] == b"end_header":
                break
        verts, faces = None, []
        for name, count, props in elements:
            is_vertex = name == b"vertex"
            is_face = name == b"face"
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if is_vertex:
                    names = [p[0] for p in props]
                    ix = [names.index(axis) for axis in (b"x", b"y", b"z")]
                    verts = np.array(
                        [[float(r[i]) for i in ix] for r in rows])
                elif is_face:
                    for r in rows:
                        n = int(r[0])
                        idx = [int(v) for v in r[1:1 + n]]
                        for k in range(1, n - 1):
                            faces.append([idx[0], idx[k], idx[k + 1]])
            elif fmt == "binary_little_endian":
                has_list = any(isinstance(p[1], tuple) for p in props)
                if not has_list:
                    dt = np.dtype([(p[0].decode(), "<" + p[1])
                                   for p in props])
                    raw = np.frombuffer(f.read(dt.itemsize * count),
                                        dtype=dt, count=count)
                    if is_vertex:
                        verts = np.stack([raw["x"], raw["y"], raw["z"]],
                                         1).astype(np.float64)
                else:
                    # element with list property: parse sequentially
                    for _ in range(count):
                        row_vals = []
                        for _, p in props:
                            if isinstance(p, tuple):
                                _, cnt_t, item_t = p
                                n = int(np.frombuffer(
                                    f.read(np.dtype(cnt_t).itemsize),
                                    "<" + cnt_t)[0])
                                items = np.frombuffer(
                                    f.read(np.dtype(item_t).itemsize * n),
                                    "<" + item_t, count=n)
                                row_vals.append(items)
                            else:
                                f.read(np.dtype(p).itemsize)
                        if is_face and row_vals:
                            idx = row_vals[0].astype(np.int64)
                            for k in range(1, len(idx) - 1):
                                faces.append([idx[0], idx[k], idx[k + 1]])
            else:
                raise ValueError(f"unsupported PLY format {fmt}")
        if verts is None:
            raise ValueError(f"{path}: no vertex element")
        if not faces:
            raise ValueError(f"{path}: no triangle faces (point cloud?)")
        return verts, np.asarray(faces, np.int64)


# --------------------------- sampling pipeline ------------------------------

def random_rotation(rng):
    """Uniform-ish random rotation via QR of a Gaussian
    (reference mesh2pc.py:26-31)."""
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    return q * np.sign(np.diag(r))


def sample_mesh_points(vertices, faces, n_points=400_000, rng=None,
                       return_normals=False):
    """Area-weighted uniform sampling on the triangle surface.

    With ``return_normals=True`` also returns the unit face normal of the
    triangle each sample came from (reference mesh2pc samplers keep
    normals for the D2 metric) as a second array.
    """
    rng = rng or np.random.default_rng()
    v0, v1, v2 = (vertices[faces[:, i]] for i in range(3))
    cross = np.cross(v1 - v0, v2 - v0)
    areas = 0.5 * np.linalg.norm(cross, axis=1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("degenerate mesh (zero surface area)")
    tri = rng.choice(len(faces), size=n_points, p=areas / total)
    u = rng.random(n_points)
    v = rng.random(n_points)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    pts = (v0[tri] + u[:, None] * (v1[tri] - v0[tri])
           + v[:, None] * (v2[tri] - v0[tri]))
    if not return_normals:
        return pts
    nrm = cross[tri]
    nlen = np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = nrm / np.where(nlen > 0, nlen, 1.0)
    return pts, nrm


def apply_scan_noise(pts, normals, rng, jitter=0.7, n_views=3,
                     backface_keep=0.15, holes=12, hole_radius=0.012,
                     density_waves=4):
    """Scanner realism for mesh-sampled clouds, in GRID coordinates.

    Mesh-sampled surfaces are perfectly smooth and uniformly dense —
    trisoup's best case and nothing like the 8iVFB scans the reference
    evaluates on (its scanned humans carry ~0.5-1 voxel of surface noise,
    view-dependent density, and occlusion holes). This models that:

      - per-point displacement along the surface normal, sigma ``jitter``
        voxels, plus a smaller isotropic component (sensor depth noise);
      - limited scanner coverage: ``n_views`` random viewpoints; a point
        whose normal faces away from every viewpoint survives only with
        probability ``backface_keep`` (coverage gaps where no scanner
        saw the surface);
      - occlusion holes: ``holes`` random patches of radius
        ``hole_radius`` x extent are dropped entirely;
      - low-frequency density variation: a random smooth field modulates
        the keep probability (scan-line / distance falloff texture).

    Returns (noisy_pts float [M,3], normals [M,3]) for the surviving
    points; the source-face normal is kept as the D2 ground truth (the
    underlying surface orientation, which is what a scanner's normal
    channel approximates).
    """
    pts = np.asarray(pts, np.float64)
    normals = np.asarray(normals, np.float64)
    n = len(pts)
    extent = float(pts.max() - pts.min()) or 1.0
    center = pts.mean(axis=0)

    keep = np.ones(n, bool)
    # limited coverage: random viewpoints far outside the cloud
    if n_views > 0:
        dirs = rng.normal(size=(n_views, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        views = center + dirs * (2.5 * extent)
        seen = np.zeros(n, bool)
        for v in views:
            to_view = v - pts
            seen |= (to_view * normals).sum(axis=1) > 0
        keep &= seen | (rng.random(n) < backface_keep)
    # low-frequency density field
    if density_waves > 0:
        w = rng.normal(size=(density_waves, 3))
        w /= np.linalg.norm(w, axis=1, keepdims=True)
        freq = rng.uniform(2.0, 6.0, density_waves) * (2 * np.pi / extent)
        phase = rng.uniform(0, 2 * np.pi, density_waves)
        field = np.mean(np.cos(pts @ (w.T * freq) + phase), axis=1)
        keep &= rng.random(n) < np.clip(0.75 + 0.45 * field, 0.2, 1.0)
    # occlusion holes
    if holes > 0 and keep.any():
        idx = np.flatnonzero(keep)
        centers = pts[rng.choice(idx, size=min(holes, len(idx)),
                                 replace=False)]
        r2 = (hole_radius * extent) ** 2
        for c in centers:
            keep &= ((pts - c) ** 2).sum(axis=1) > r2
    pts = pts[keep]
    normals = normals[keep]
    # depth noise: along-normal + smaller isotropic jitter (voxel units)
    pts = (pts + normals * rng.normal(0, jitter, len(pts))[:, None]
           + rng.normal(0, 0.35 * jitter, pts.shape))
    return pts, normals


def mesh_to_cloud(path, n_points=400_000, resolution=255, rotate=True,
                  rng=None, scan_noise=False, return_normals=False,
                  **noise_kw):
    """Mesh file -> voxelized int point cloud in [0, resolution]
    (reference mesh2pc.py:56-89 pipeline: sample, rotate, normalize to the
    grid, round, dedupe).

    ``scan_noise=True`` applies :func:`apply_scan_noise` in grid
    coordinates before quantization (``**noise_kw`` forwarded).
    ``return_normals=True`` also returns the per-voxel unit mesh normal
    (first sample surviving dedup) for D2 scoring.
    """
    rng = rng or np.random.default_rng()
    verts, faces = load_mesh(path)
    pts, nrm = sample_mesh_points(verts, faces, n_points, rng,
                                  return_normals=True)
    if rotate:
        rot = random_rotation(rng)
        pts = pts @ rot.T
        nrm = nrm @ rot.T
    pts = pts - pts.min(axis=0)
    extent = pts.max()
    if extent > 0:
        pts = pts * (resolution / extent)
    if scan_noise:
        pts, nrm = apply_scan_noise(pts, nrm, rng, **noise_kw)
        pts = np.clip(pts, 0, resolution)
    qpts, idx = np.unique(np.round(pts), axis=0, return_index=True)
    qpts = qpts.astype(np.int32)
    if return_normals:
        return qpts, nrm[idx]
    return qpts


# --------------------------- shard generation -------------------------------

def generate_dataset(ply_glob, out_dir, cube_size=64, min_num=20,
                     cubes_per_shard=4096, seed=0, write_h5=False):
    """Point-cloud PLYs -> shuffled per-cube training shards
    (reference generate_dataset.py:11-49).

    Returns the number of cubes written.
    """
    files = sorted(glob.glob(ply_glob))
    if not files:
        raise FileNotFoundError(f"no PLYs match {ply_glob!r}")
    os.makedirs(out_dir, exist_ok=True)
    all_cubes = []
    for f in files:
        pts = ply.load_ply(f)
        try:
            local, ids, positions, _ = partition.partition_points(
                pts, cube_size, min_num)
        except ValueError:
            continue
        for i in range(len(positions)):
            all_cubes.append(local[ids == i].astype(np.int16))
    rnd = random.Random(seed)
    rnd.shuffle(all_cubes)

    if write_h5:
        import h5py
        for i, cube in enumerate(all_cubes):
            with h5py.File(os.path.join(out_dir, f"{i}.h5"), "w") as h:
                h.create_dataset("data", data=cube.astype(np.uint8))
        return len(all_cubes)

    for s in range(0, len(all_cubes), cubes_per_shard):
        chunk = all_cubes[s:s + cubes_per_shard]
        offsets = np.zeros(len(chunk) + 1, np.int64)
        offsets[1:] = np.cumsum([len(c) for c in chunk])
        np.savez_compressed(
            os.path.join(out_dir, f"shard_{s // cubes_per_shard:05d}.npz"),
            points=np.concatenate(chunk).astype(np.int16),
            offsets=offsets)
    return len(all_cubes)
