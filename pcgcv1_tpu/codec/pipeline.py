"""Pre/post-processing pipeline: scale -> partition -> voxelize and back.

Capability parity with the reference pipeline (`process.py:16-82`), with the
disk round-trips for scaled clouds removed (the reference writes a temp PLY
and re-reads it; here scaling is in-memory).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pcgcv1_tpu.ops import partition, ply, topk, voxel


@dataclasses.dataclass
class PreprocessResult:
    cubes: np.ndarray           # uint8 [B, cs, cs, cs, 1] occupancy (0/1)
    cube_positions: np.ndarray  # int32 [B, 3] canonical order
    points_numbers: np.ndarray  # uint16 [B] occupied-voxel count per cube
    # sorted unique flat voxel ids (cube-major: id = cube*cs^3 + x*cs^2 +
    # y*cs + z). The codec's sparse-upload fast path ships these instead of
    # the dense occupancy grid — ~10x less host->device traffic.
    flat_ids: np.ndarray = None
    cube_size: int = 64


def scale_points(points, scale):
    """Downscale integer points: round(points * scale), dedupe.

    Mirrors `process.py:29-30`. Returns int32 coordinates.
    """
    if scale == 1:
        return np.asarray(points, dtype=np.int32)
    pc = np.round(np.asarray(points, dtype=np.float32) * scale)
    pc = np.unique(pc, axis=0)
    return pc.astype(np.int32)


def preprocess(input_file, scale=1.0, cube_size=64, min_num=64):
    """PLY file -> partitioned occupancy cubes.

    Returns PreprocessResult with cubes in canonical cube order
    (see `pcgcv1_tpu.ops.partition.canonical_order`).
    """
    points = ply.load_ply(input_file)
    return preprocess_points(points, scale, cube_size, min_num)


def preprocess_points(points, scale=1.0, cube_size=64, min_num=64):
    points = scale_points(points, scale)
    local, cube_ids, cube_positions, _ = partition.partition_points(
        points, cube_size, min_num)
    cs = cube_size
    b = len(cube_positions)
    flat = (cube_ids.astype(np.int64) * (cs * cs * cs)
            + local[:, 0].astype(np.int64) * (cs * cs)
            + local[:, 1].astype(np.int64) * cs
            + local[:, 2].astype(np.int64))
    flat_ids = np.unique(flat)  # sorted, deduped (cube-major)
    bounds = np.searchsorted(flat_ids,
                             np.arange(1, b + 1, dtype=np.int64) * (cs**3))
    counts = np.diff(np.concatenate([[0], bounds]))
    if counts.max(initial=0) > np.iinfo(np.uint16).max:
        # the container stores per-cube counts as uint16 (reference
        # inout_bitstream.py pointnums format); a wrapped count would
        # silently corrupt the decoder's top-k k. 64^3 cubes can't hit
        # this (max 262,144 > 65,535 IS reachable only for cube_size>40
        # fully dense cubes — unseen in practice, but fail loudly).
        raise OverflowError(
            f"cube with {counts.max()} occupied voxels exceeds the uint16 "
            f"pointnums container field; reduce cube_size or scale")
    points_numbers = counts.astype(np.uint16)
    # uint8 occupancy: 4x less host memory/glue than f32 and the codec's
    # transport dtype directly (transforms._occupancy_u8 passes it through)
    cubes = np.zeros(b * cs * cs * cs, np.uint8)
    cubes[flat_ids] = 1
    cubes = cubes.reshape(b, cs, cs, cs, 1)
    return PreprocessResult(cubes, cube_positions, points_numbers,
                            flat_ids=flat_ids, cube_size=cs)


def postprocess_points(cubes, points_numbers, cube_positions, scale=1.0,
                       cube_size=64, rho=1.0, fixed_thres=None):
    """Decoded logit cubes -> reconstructed global points.

    Returns float64 [N,3] points (integer-valued unless scale != 1).
    """
    mask = topk.select_voxels(cubes, points_numbers, rho, fixed_thres)
    per_cube = voxel.voxels_to_points(mask)
    points = partition.assemble_points(per_cube, cube_positions, cube_size)
    if scale != 1:
        return points.astype(np.float64) * (1.0 / scale)
    return points.astype(np.float64)


def postprocess_from_masks(masks, cube_positions, scale=1.0, cube_size=64):
    """Device-classified occupancy masks -> reconstructed global points.

    Fast path counterpart of postprocess_points: the rho-weighted top-k ran
    on device (codec ``decompress_*_masks``), so only devoxelize/assemble
    remain on host.
    """
    per_cube = voxel.voxels_to_points(masks)
    points = partition.assemble_points(per_cube, cube_positions, cube_size)
    if scale != 1:
        return points.astype(np.float64) * (1.0 / scale)
    return points.astype(np.float64)


def postprocess(output_file, cubes, points_numbers, cube_positions,
                scale=1.0, cube_size=64, rho=1.0, fixed_thres=None):
    """Classify, extract, reassemble and write the reconstruction to PLY."""
    points = postprocess_points(cubes, points_numbers, cube_positions, scale,
                                cube_size, rho, fixed_thres)
    if scale == 1:
        ply.write_ply(output_file, points.astype(np.int64))
    else:
        ply.write_ply(output_file, points)
    return points
