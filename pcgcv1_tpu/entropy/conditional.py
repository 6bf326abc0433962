"""Laplace conditional entropy model (device side).

Capability parity with the reference `models/conditional_entropy_model.py`
("SymmetricConditional"): the hyper-decoder predicts per-voxel Laplace
(loc, scale); the likelihood of a quantized value v is
|F(v + 1/2) - F(v - 1/2)| with the mirror-around-loc sign trick
(`conditional_entropy_model.py:44-54`).

This module is parameter-free. Coding (the quantized-CDF range coder) lives
in the C++ runtime (`pcgcv1_tpu.native.laplace_*`); these functions provide
training likelihoods and quantization only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LIKELIHOOD_BOUND = 1e-9
SCALE_LOWER_BOUND = 1e-9  # reference transform.py:145


def _laplace_cdf(x, loc, scale):
    mask_r = x > loc
    c_l = 0.5 * jnp.exp(-jnp.abs(x - loc) / scale)
    c_r = 1.0 - 0.5 * jnp.exp(-jnp.abs(x - loc) / scale)
    return jnp.where(mask_r, c_r, c_l)


def likelihood(values, loc, scale):
    """Elementwise Laplace interval likelihoods, numerically symmetric."""
    upper = values + 0.5
    lower = values - 0.5
    sign = jnp.sign(upper + lower - loc)
    upper_m = -sign * (upper - loc) + loc
    lower_m = -sign * (lower - loc) + loc
    lik = jnp.abs(_laplace_cdf(upper_m, loc, scale)
                  - _laplace_cdf(lower_m, loc, scale))
    return jnp.maximum(lik, LIKELIHOOD_BOUND)


def quantize(x, training: bool = False, rng=None):
    if training:
        noise = jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
        return x + noise
    return jnp.round(x)


def apply(x, loc, scale, training: bool = False, rng=None):
    """(values, likelihoods) — the reference's SymmetricConditional.call."""
    scale = jnp.maximum(scale, SCALE_LOWER_BOUND)
    values = quantize(x, training, rng)
    return values, likelihood(values, loc, scale)
