"""Entropy models: factorized bottleneck and Laplace conditional."""

from pcgcv1_tpu.entropy.factorized import FactorizedEntropy
from pcgcv1_tpu.entropy import conditional

__all__ = ["FactorizedEntropy", "conditional"]
