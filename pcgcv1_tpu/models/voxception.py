"""VoxceptionResNet transforms.

Capability parity with the reference model family
(`models/model_voxception.py` in NJUVISION/PCGCv1), same layer hyperparams
(kernel sizes, strides, widths, bias usage, activations) so rate-distortion
behavior is comparable, re-expressed as flax modules that run **batched over
all cubes in one call** — the reference maps cube-by-cube with
`tf.map_fn(parallel_iterations=1)` (`transform.py:48`), which is the single
biggest throughput loss it has.

Layout: NDHWC. ``dtype`` selects the activation/compute dtype (bfloat16 for
TPU throughput); params stay float32 and module outputs are cast back to
float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pcgcv1_tpu.models import subpixel


class VRNBlock(nn.Module):
    """Two-path Voxception-ResNet block (reference `model_voxception.py:11-68`).

    path1: 3x3x3 conv (n/4) -> 3x3x3 conv (n/2)
    path2: 1x1x1 (n/4) -> 3x3x3 (n/4) -> 1x1x1 (n/2)
    output: relu(x + concat(path1, path2)); all convs ReLU with bias.
    """

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.filters

        def conv(feat, kernel, name):
            return nn.Conv(feat, (kernel,) * 3, padding="SAME",
                           use_bias=True, dtype=self.dtype, name=name)

        t1 = nn.relu(conv(n // 4, 3, "conv1_1")(x))
        t1 = nn.relu(conv(n // 2, 3, "conv1_2")(t1))
        t2 = nn.relu(conv(n // 4, 1, "conv2_1")(x))
        t2 = nn.relu(conv(n // 4, 3, "conv2_2")(t2))
        t2 = nn.relu(conv(n // 2, 1, "conv2_3")(t2))
        residual = jnp.concatenate([t1, t2], axis=-1)
        return nn.relu(x + residual)


class AnalysisTransform(nn.Module):
    """Occupancy cube -> latent: [B,N,N,N,1] -> [B,N/4,N/4,N/4,16].

    Reference `model_voxception.py:71-144`: conv_in 16 -> 3xVRN(16) ->
    strided down 32 (no bias) -> 3xVRN(32) -> down 64 (no bias) ->
    3xVRN(64) -> conv_out 16 linear.

    ``remat=True`` rematerializes each VRN block in the backward pass
    (jax.checkpoint) — required to train batch 8 x 64^3 within one chip's
    HBM; inference leaves it off.
    """

    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        block = nn.remat(VRNBlock) if self.remat else VRNBlock
        x = x.astype(d)
        x = nn.relu(nn.Conv(16, (3, 3, 3), padding="SAME", dtype=d,
                            name="conv_in")(x))
        for i in range(3):
            x = block(16, dtype=d, name=f"vrn1_{i+1}")(x)
        x = nn.relu(nn.Conv(32, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                            use_bias=False, dtype=d, name="down_1")(x))
        for i in range(3):
            x = block(32, dtype=d, name=f"vrn2_{i+1}")(x)
        x = nn.relu(nn.Conv(64, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                            use_bias=False, dtype=d, name="down_2")(x))
        for i in range(3):
            x = block(64, dtype=d, name=f"vrn3_{i+1}")(x)
        x = nn.Conv(16, (3, 3, 3), padding="SAME", dtype=d,
                    name="conv_out")(x)
        return x.astype(jnp.float32)


class SynthesisTransform(nn.Module):
    """Latent -> occupancy logits (reference `model_voxception.py:147-214`).

    ``remat=True``: see AnalysisTransform.

    ``deconv``: "xla" = nn.ConvTranspose (XLA's dilated-input lowering);
    "poly" = polyphase sub-pixel lowering (models/subpixel.py) — the same
    function and the same parameter tree, ~2.4x vs 8x padded FLOPs and an
    8x wider output-channel axis for the MXU."""

    dtype: Any = jnp.float32
    remat: bool = False
    deconv: str = "xla"

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        block = nn.remat(VRNBlock) if self.remat else VRNBlock

        def up(feat, name):
            if self.deconv == "poly":
                return subpixel.PolyConvTranspose(feat, dtype=d, name=name)
            return nn.ConvTranspose(feat, (3, 3, 3), strides=(2, 2, 2),
                                    padding="SAME", dtype=d, name=name)

        x = x.astype(d)
        x = nn.relu(nn.Conv(64, (3, 3, 3), padding="SAME", dtype=d,
                            name="deconv_in")(x))
        for i in range(3):
            x = block(64, dtype=d, name=f"dvrn1_{i+1}")(x)
        x = nn.relu(up(32, "up_1")(x))
        for i in range(3):
            x = block(32, dtype=d, name=f"dvrn2_{i+1}")(x)
        x = nn.relu(up(16, "up_2")(x))
        for i in range(3):
            x = block(16, dtype=d, name=f"dvrn3_{i+1}")(x)
        x = nn.Conv(1, (3, 3, 3), padding="SAME", dtype=d,
                    name="deconv_out")(x)
        return x.astype(jnp.float32)


class HyperEncoder(nn.Module):
    """y -> z: [B,n,n,n,16] -> [B,n/2,n/2,n/2,8]
    (reference `model_voxception.py:217-252`)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        x = nn.relu(nn.Conv(16, (3, 3, 3), padding="SAME", dtype=d,
                            name="conv1")(x))
        x = nn.relu(nn.Conv(16, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                            dtype=d, name="conv2")(x))
        x = nn.Conv(8, (3, 3, 3), padding="SAME", dtype=d, name="conv3")(x)
        return x.astype(jnp.float32)


class HyperDecoder(nn.Module):
    """z_hat -> (loc, scale) for the conditional model
    (reference `model_voxception.py:255-308`). scale = |head2|.

    NOTE: this module feeds the entropy coder. The determinism contract
    (SURVEY.md §5) requires encoder- and decoder-side evaluations to be
    the SAME compiled program on the same platform — which holds for any
    compute dtype, so ``dtype`` may be bfloat16 for throughput: the
    stream records which prior program produced its codes
    (codec/bitstream.py flags bit 4) and decode picks the matching one.
    Cross-platform decode still uses the integer prior
    (entropy/qprior.py). Params stay float32; outputs are float32.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        x = nn.relu(nn.Conv(16, (3, 3, 3), padding="SAME", dtype=d,
                            name="deconv1")(x))
        x = nn.relu(nn.ConvTranspose(16, (3, 3, 3), strides=(2, 2, 2),
                                     padding="SAME", dtype=d,
                                     name="deconv2")(x))
        x = nn.relu(nn.Conv(32, (3, 3, 3), padding="SAME", dtype=d,
                            name="deconv3")(x))
        loc = nn.Conv(16, (3, 3, 3), padding="SAME", dtype=d,
                      name="deconv4_1")(x)
        scale = nn.Conv(16, (3, 3, 3), padding="SAME", dtype=d,
                        name="deconv4_2")(x)
        return loc.astype(jnp.float32), jnp.abs(scale).astype(jnp.float32)
