"""Neural transforms (flax): Voxception and simple analysis/synthesis."""

from pcgcv1_tpu.models.registry import get_model, ModelFamily

__all__ = ["get_model", "ModelFamily"]
