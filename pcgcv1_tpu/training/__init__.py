"""Training: losses, data pipeline, pjit train loop."""

from pcgcv1_tpu.training.losses import (
    bce_losses, classify_metrics, focal_loss, bpp_from_likelihoods)

__all__ = ["bce_losses", "classify_metrics", "focal_loss",
           "bpp_from_likelihoods"]
