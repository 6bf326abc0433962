"""Factorized (fully learned) entropy bottleneck.

Capability parity with the reference `models/entropy_model.py` (Ballé et al.
2018 univariate density model): per channel, K = len(filters)+1 stages of

    logits = softplus(matrix) @ logits + bias
    logits += tanh(factor) * tanh(logits)

with CDF = sigmoid(logits). Training adds U(-1/2, 1/2) noise; inference
rounds. The likelihood of a quantized value v is CDF(v+1/2) - CDF(v-1/2),
computed with the reference's sign-flip trick for numerical symmetry
(`entropy_model.py:140-143`).

Device side (this module) is used for training losses and quantization.
The *coding* side CDF tables are built by the C++ runtime
(`pcgcv1_tpu.native.factorized_cdf`) from the same float32 parameters in
deterministic double precision — see `export_cdf_weights`.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FactorizedEntropy(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3)
    init_scale: float = 8.0
    likelihood_bound: float = 1e-9
    param_dtype: Any = jnp.float32

    @property
    def dims(self):
        return (1,) + tuple(self.filters) + (1,)

    def setup(self):
        dims = self.dims
        k = len(self.filters) + 1
        scale = self.init_scale ** (1.0 / k)
        matrices, biases, factors = [], [], []
        for i in range(k):
            init = float(np.log(np.expm1(1.0 / scale / dims[i + 1])))
            matrices.append(self.param(
                f"matrix_{i}",
                lambda key, shape, v=init: jnp.full(shape, v,
                                                    self.param_dtype),
                (self.channels, dims[i + 1], dims[i])))
            biases.append(self.param(
                f"bias_{i}",
                lambda key, shape: jax.random.uniform(
                    key, shape, self.param_dtype, -0.5, 0.5),
                (self.channels, dims[i + 1], 1)))
            factors.append(self.param(
                f"factor_{i}", nn.initializers.zeros,
                (self.channels, dims[i + 1], 1)))
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

    def logits_cumulative(self, x):
        """Logits of the cumulative density. x: [C, 1, M] -> [C, 1, M]."""
        logits = x
        for m, b, f in zip(self._matrices, self._biases, self._factors):
            logits = jnp.matmul(jax.nn.softplus(m), logits) + b
            logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def _likelihood(self, values):
        """values: [..., C] -> elementwise likelihoods [..., C]."""
        shape = values.shape
        # -> [C, 1, M]
        x = jnp.moveaxis(values, -1, 0).reshape(self.channels, 1, -1)
        lower = self.logits_cumulative(x - 0.5)
        upper = self.logits_cumulative(x + 0.5)
        sign = -jnp.sign(lower + upper)
        lik = jnp.abs(jax.nn.sigmoid(sign * upper)
                      - jax.nn.sigmoid(sign * lower))
        lik = lik.reshape((self.channels,) + shape[:-1])
        return jnp.moveaxis(lik, 0, -1)

    def __call__(self, x, training: bool = False, rng=None):
        """Quantize (noise if training else round) and return likelihoods."""
        if training:
            if rng is None:
                rng = self.make_rng("noise")
            noise = jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
            values = x + noise
        else:
            values = jnp.round(x)
        lik = jnp.maximum(self._likelihood(values), self.likelihood_bound)
        return values, lik


def export_cdf_weights(params):
    """Flatten FactorizedEntropy params for `native.factorized_cdf`.

    Args:
      params: the module's param dict {"matrix_0": [C,d1,d0], ...}.

    Returns:
      (matrices [C, sum d1*d0], biases [C, sum d1], factors [C, sum d1],
       dims tuple) as float32 numpy arrays.
    """
    k = len([n for n in params if n.startswith("matrix_")])
    mats, biases, factors, dims = [], [], [], None
    for i in range(k):
        m = np.asarray(params[f"matrix_{i}"], np.float32)
        b = np.asarray(params[f"bias_{i}"], np.float32)
        f = np.asarray(params[f"factor_{i}"], np.float32)
        c = m.shape[0]
        if dims is None:
            dims = [m.shape[2]]
        dims.append(m.shape[1])
        mats.append(m.reshape(c, -1))
        biases.append(b.reshape(c, -1))
        factors.append(f.reshape(c, -1))
    return (np.concatenate(mats, axis=1), np.concatenate(biases, axis=1),
            np.concatenate(factors, axis=1), tuple(dims))
