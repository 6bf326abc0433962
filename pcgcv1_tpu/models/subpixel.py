"""Polyphase (sub-pixel) lowering of stride-2 transposed 3D convolutions.

The reference upsamples with Conv3DTranspose stride 2, kernel 3
(`models/model_voxception.py:164-183`). XLA lowers a transposed conv to a
regular conv over the zero-dilated input: the MXU executes 27 taps over the
*output*-resolution grid, 8x of which land on inserted zeros — wasted FLOPs
at channel widths that already run the MXU poorly.

This module computes the IDENTICAL function as one stride-1 kernel-2^3
convolution producing all 8 output phases in the channel axis, followed by
a depth-to-space interleave:

  flax ConvTranspose(k=3, s=2, 'SAME') == conv(dilate_2(x), W, pad=(2,1))
  (lax._conv_transpose_padding: pad_a = ceil((k+s-2)/2) = 2, pad_b = 1)

  per dim, output m with taps t in 0..2 reads dilated index m-2+t:
    m = 2u   (even phase): t=0 -> x[u-1]*W[0],  t=2 -> x[u]*W[2]
    m = 2u+1 (odd  phase): t=1 -> x[u]*W[1]
  i.e. both phases are kernel-2 convs over (x[u-1], x[u]) with weights
  (W[0], W[2]) and (0, W[1]).

In 3D the 8 phase kernels are outer products of those per-dim selections,
packed into one kernel of shape (2,2,2, Cin, 8*Cout). 27 of the 64 tap
slots are nonzero, so the dense lowering pays 64/27 = 2.4x the useful
FLOPs — against the dilated form's 8x — with an output channel axis 8x
wider (e.g. 256 for the 32-channel upsample), which is what the 128-lane
MXU actually wants.

Exactness: same multiplies, reassociated only across the (zero) tap slots;
bf16/f32 results match the flax module to accumulation-order tolerance
(tests/test_models.py::TestSubpixel asserts allclose at f32).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def pack_subpixel_kernel(w):
    """(3,3,3,Cin,Cout) ConvTranspose kernel -> (2,2,2,Cin,8*Cout).

    Phase p = e*4 + f*2 + g for output offsets (e,f,g) in {0,1}^3; the
    packed output channel is p*Cout + c.
    """
    k, _, _, cin, cout = w.shape
    if k != 3:
        raise ValueError("polyphase packing implemented for kernel 3 only")
    # per-dim tap table: tap[phase][position] = kernel index or None (zero)
    taps = {0: {0: 0, 1: 2},   # even phase: (W0, W2)
            1: {0: None, 1: 1}}  # odd phase: (0, W1)
    out = jnp.zeros((2, 2, 2, cin, 8 * cout), w.dtype)
    for e in range(2):
        for f in range(2):
            for g in range(2):
                p = e * 4 + f * 2 + g
                for a in range(2):
                    ta = taps[e][a]
                    if ta is None:
                        continue
                    for b in range(2):
                        tb = taps[f][b]
                        if tb is None:
                            continue
                        for c in range(2):
                            tc = taps[g][c]
                            if tc is None:
                                continue
                            out = out.at[a, b, c, :,
                                         p * cout:(p + 1) * cout].set(
                                w[ta, tb, tc])
    return out


def conv_transpose_subpixel(x, kernel, bias=None):
    """Exact equivalent of flax ConvTranspose(Cout, (3,3,3), strides=2,
    padding='SAME') given that module's kernel/bias.

    x: (B, D, H, W, Cin) -> (B, 2D, 2H, 2W, Cout).
    """
    cout = kernel.shape[-1]
    packed = pack_subpixel_kernel(kernel)
    y = lax.conv_general_dilated(
        x, packed.astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(1, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    b, d, h, w, _ = y.shape
    y = y.reshape(b, d, h, w, 2, 2, 2, cout)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    y = y.reshape(b, 2 * d, 2 * h, 2 * w, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class PolyConvTranspose(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (3,3,3), strides=(2,2,2),
    padding='SAME'): identical parameter names/shapes (checkpoints are
    interchangeable), polyphase compute."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        return conv_transpose_subpixel(
            x.astype(self.dtype), kernel.astype(self.dtype),
            None if bias is None else bias.astype(self.dtype))
