"""Geometry core ops: PLY io, partition, voxelization, top-k classification."""

from pcgcv1_tpu.ops.ply import load_ply, write_ply, load_ply_with_normals
from pcgcv1_tpu.ops.partition import (
    canonical_order,
    partition_points,
    assemble_points,
)
from pcgcv1_tpu.ops.voxel import points_to_voxels, voxels_to_points
from pcgcv1_tpu.ops.topk import select_voxels, adaptive_thresholds

__all__ = [
    "load_ply",
    "write_ply",
    "load_ply_with_normals",
    "canonical_order",
    "partition_points",
    "assemble_points",
    "points_to_voxels",
    "voxels_to_points",
    "select_voxels",
    "adaptive_thresholds",
]
