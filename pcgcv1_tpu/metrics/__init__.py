"""Quality metrics: D1/D2 PSNR (pc_error equivalent), BD-rate."""

from pcgcv1_tpu.metrics.pc_error import pc_error, estimate_normals
from pcgcv1_tpu.metrics.bdrate import bdrate, bdsnr

__all__ = ["pc_error", "estimate_normals", "bdrate", "bdsnr"]
