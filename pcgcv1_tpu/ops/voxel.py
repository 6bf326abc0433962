"""Voxelization: point lists <-> binary occupancy grids.

Capability parity with `dataprocess/inout_points.py:116-143` (reference),
vectorized: one flat scatter over all points instead of a per-cube Python
loop. Runs on host numpy — the arrays feed the device as one batched tensor.
"""

from __future__ import annotations

import numpy as np


def points_to_voxels(local_points, cube_ids, num_cubes, cube_size=64,
                     dtype=np.float32):
    """Scatter per-cube local points into [B, cs, cs, cs, 1] occupancy.

    Args:
      local_points: int [N,3] local coordinates in [0, cube_size).
      cube_ids: int [N] cube id per point (0..num_cubes-1).
      num_cubes: B.
      cube_size: cs.

    Returns:
      float array [B, cs, cs, cs, 1] with 1.0 at occupied voxels.
      Duplicate points collapse to a single occupied voxel (same as the
      reference's assignment scatter, `inout_points.py:127`).
    """
    cs = cube_size
    vol = np.zeros((num_cubes * cs * cs * cs,), dtype=dtype)
    lp = np.asarray(local_points, dtype=np.int64)
    flat = (np.asarray(cube_ids, dtype=np.int64) * (cs * cs * cs)
            + lp[:, 0] * (cs * cs) + lp[:, 1] * cs + lp[:, 2])
    vol[flat] = 1.0
    return vol.reshape(num_cubes, cs, cs, cs, 1)


def voxels_to_points(voxels, threshold=0.0):
    """Extract per-cube point lists from occupancy volumes.

    Args:
      voxels: [B, cs, cs, cs] or [B, cs, cs, cs, 1] array; a voxel is
        occupied when strictly greater than ``threshold`` (reference uses
        ``vol > 0`` on a 0/1 mask, `inout_points.py:140`).

    Returns:
      list of int32 [n_b, 3] arrays in row-major (x, y, z ascending) order.
    """
    v = np.asarray(voxels)
    if v.ndim == 5:
        v = v[..., 0]
    out = []
    for b in range(v.shape[0]):
        pts = np.argwhere(v[b] > threshold).astype(np.int32)
        out.append(pts)
    return out


def occupied_counts(voxels):
    """Number of occupied voxels per cube -> int64 [B].

    Mirrors ``np.sum(cubes, axis=(1,2,3,4))`` in `process.py:45` — note this
    counts *unique* voxels, not raw points.
    """
    v = np.asarray(voxels)
    return v.reshape(v.shape[0], -1).sum(axis=1).astype(np.int64)
