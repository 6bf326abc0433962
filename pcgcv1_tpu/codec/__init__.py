"""Codec orchestration: pre/post pipeline, compress/decompress, bitstream."""

from pcgcv1_tpu.codec.pipeline import preprocess, postprocess

__all__ = ["preprocess", "postprocess"]
