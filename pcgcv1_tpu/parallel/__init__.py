"""Device mesh and sharding helpers."""

from pcgcv1_tpu.parallel.mesh import make_mesh, batch_sharding, shard_params

__all__ = ["make_mesh", "batch_sharding", "shard_params"]
