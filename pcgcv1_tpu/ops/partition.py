"""Cube partitioning of voxelized point clouds.

Capability parity with the reference partitioner/reassembler
(`dataprocess/inout_points.py:50-112`), fully vectorized:

The reference builds a python dict keyed by ``point // cube_size``
(10+ seconds for 858k points, BASELINE.md). Here partitioning is a single
``//`` + ``np.unique`` + argsort, ~100x faster, with identical semantics:

- cubes with fewer than ``min_num`` points are dropped (lossy, by design);
- the canonical cube order is ascending by the linearized index
  ``x + y*step + z*step**2`` with ``step = kept_positions.max() + 1``
  (`inout_points.py:80-86`) — the bitstream contract both sides must share.
"""

from __future__ import annotations

import numpy as np


def canonical_order(cube_positions):
    """Return the permutation sorting cube positions into canonical order.

    Canonical order is ascending ``x + y*step + z*step**2`` with
    ``step = cube_positions.max() + 1`` (reference `inout_points.py:80-86`).
    The decoder recovers the identical order from the losslessly coded
    positions, so per-cube payloads (point counts, latent strings) are
    stored in this order.
    """
    cube_positions = np.asarray(cube_positions, dtype=np.int64)
    step = int(cube_positions.max()) + 1
    lin = (cube_positions[:, 0]
           + cube_positions[:, 1] * step
           + cube_positions[:, 2] * step * step)
    return np.argsort(lin, kind="stable")


def partition_points(points, cube_size=64, min_num=20):
    """Split integer points into cubes.

    Args:
      points: int array [N,3] of voxel coordinates (non-negative).
      cube_size: edge length of a cube.
      min_num: cubes holding fewer raw points are dropped.

    Returns:
      local_points: int16 [N_kept, 3] coordinates local to their cube,
        grouped by cube in canonical order (within a cube, original file
        order is preserved).
      cube_index_of_point: int32 [N_kept] canonical cube id per point.
      cube_positions: int32 [M, 3] kept cube coordinates in canonical order.
      counts: int64 [M] raw point count per cube (pre-dedup).
    """
    points = np.asarray(points)
    if points.size == 0:
        raise ValueError("empty point cloud")
    cube_idx = (points // cube_size).astype(np.int64)
    local = (points % cube_size).astype(np.int16)

    # Group points by cube via 1-D linearized keys (int64 sort; ~5x faster
    # than np.unique over rows for vox10-scale clouds).
    span = int(cube_idx.max()) + 1
    keys = (cube_idx[:, 0] * span + cube_idx[:, 1]) * span + cube_idx[:, 2]
    uniq_keys, inverse, counts = np.unique(
        keys, return_inverse=True, return_counts=True)
    inverse = inverse.reshape(-1)
    uniq = np.stack([uniq_keys // (span * span),
                     (uniq_keys // span) % span,
                     uniq_keys % span], axis=1)

    keep = counts >= min_num
    if not keep.any():
        raise ValueError(
            f"all cubes have fewer than min_num={min_num} points")
    kept_positions = uniq[keep]

    # Canonical order over kept cubes (step computed from kept positions,
    # matching the reference which filters before ordering).
    order = canonical_order(kept_positions)
    cube_positions = kept_positions[order].astype(np.int32)
    counts = counts[keep][order]

    # Map each point's unique-cube id -> canonical id (or -1 if dropped).
    remap = np.full(uniq.shape[0], -1, dtype=np.int64)
    kept_ids = np.nonzero(keep)[0][order]
    remap[kept_ids] = np.arange(len(kept_ids))
    point_cube = remap[inverse]
    mask = point_cube >= 0

    local = local[mask]
    point_cube = point_cube[mask]
    # Stable sort by cube id preserves intra-cube original order.
    perm = np.argsort(point_cube, kind="stable")
    return (local[perm], point_cube[perm].astype(np.int32),
            cube_positions, counts.astype(np.int64))


def assemble_points(local_points_per_cube, cube_positions, cube_size=64):
    """Inverse of partitioning: global coords from per-cube locals.

    ``cube_positions`` may arrive in any order (the lossless position codec
    does not preserve it); they are re-sorted canonically and zipped with the
    per-cube point lists, replicating `inout_points.py:92-112`.
    """
    cube_positions = np.asarray(cube_positions, dtype=np.int64)
    order = canonical_order(cube_positions)
    ordered = cube_positions[order]
    out = []
    for pos, local in zip(ordered, local_points_per_cube):
        out.append(np.asarray(local, dtype=np.int64) + pos * cube_size)
    return np.concatenate(out, axis=0)
