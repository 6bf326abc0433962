"""Simple (Quach ICIP-2019-style) ablation model.

Capability parity with `models/model_simple.py` in the reference: three
strided convs to a 32-channel latent at 1/8 spatial resolution, mirrored
deconvs back. Used by the ablation study harness (`--modelname`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class AnalysisTransform(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        x = nn.relu(nn.Conv(32, (9, 9, 9), strides=(2, 2, 2), padding="SAME",
                            dtype=d, name="conv_1")(x))
        x = nn.relu(nn.Conv(32, (5, 5, 5), strides=(2, 2, 2), padding="SAME",
                            dtype=d, name="conv_2")(x))
        x = nn.Conv(32, (5, 5, 5), strides=(2, 2, 2), padding="SAME",
                    use_bias=False, dtype=d, name="conv_3")(x)
        return x.astype(jnp.float32)


class SynthesisTransform(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        x = nn.relu(nn.ConvTranspose(32, (5, 5, 5), strides=(2, 2, 2),
                                     padding="SAME", dtype=d,
                                     name="deconv_1")(x))
        x = nn.relu(nn.ConvTranspose(32, (5, 5, 5), strides=(2, 2, 2),
                                     padding="SAME", dtype=d,
                                     name="deconv_2")(x))
        x = nn.ConvTranspose(1, (9, 9, 9), strides=(2, 2, 2), padding="SAME",
                             dtype=d, name="deconv_3")(x)
        return x.astype(jnp.float32)
