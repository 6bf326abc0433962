"""Integer-quantized hyper-decoder inference ("int prior").

Purpose: make hyper-mode bitstreams decodable on ANY backend, not just the
platform that encoded them. The reference's conditional entropy model feeds
the range coder from float convolutions, which is the root of its known
GPU decode-mismatch bug (NJUVISION/PCGCv1 README.md:111-114) — our float
path fixes that within one platform by sharing a single jitted "prior"
program, but the prior codes still change across platforms/chunk shapes.
This module removes float arithmetic from the prior entirely.

Scheme (the procedure below DEFINES the stream format for prior="int"):

- **Weight codes**: each hyper-decoder conv's kernel is mapped to integers
  ``w_q = round(w * 2^b_o)`` with a per-output-channel exponent ``b_o``
  chosen from the checkpoint weights alone by exact max/integer arithmetic
  (:func:`derive_weight_codes`) so that (a) ``|w_q| <= W_MAX`` and (b) the
  worst-case integer accumulator stays below 2^24. Both encoder and decoder
  re-derive identical codes from identical checkpoint bytes.
- **Exact-in-f32 convolutions**: activations are 8-bit integers and weight
  codes are <= W_MAX = 4095, so every product is exactly representable and
  every partial sum is an integer < 2^24 — IEEE f32 adds integers in that
  range exactly, REGARDLESS of accumulation order or backend. The convs
  therefore run through XLA's native (MXU) conv kernels at full speed and
  still produce bit-identical integers on TPU and CPU. (On TPU, f32 ops
  round through bfloat16 passes; both operand classes here have <= 8 and
  <= 16 significant bits, with the 8-bit side exact in bf16, so every pass
  is exact too. precision=HIGHEST is set explicitly.)
- **Integer requantization**: between layers, accumulators are rounded to
  unsigned 8-bit activations in int32 arithmetic with per-channel rounding
  shifts. The activation scale exponents ``a_l`` (3 small ints) are
  calibrated by the ENCODER on real data and shipped in the bitstream
  header — the decoder never calibrates and never touches floats.
- **Heads**: ``loc_q`` by an integer rounding shift onto the 1/8-voxel
  transport grid; ``scale_q = round(8*log2(scale)) + const`` by exponent/
  mantissa extraction of the exact int->f32 conversion plus 8 mantissa
  thresholds (pure int32 ops).

Consequences: with ``prior="int"`` + the device rANS coder, a stream
encodes on TPU and decodes bit-exactly on CPU (or any chip count / chunk
size — exact integer sums are order-independent, so the batch-shape
determinism contract of the float path is no longer needed).

Reference parity: the float hyper-decoder this quantizes is
model_voxception.py:255-308 in NJUVISION/PCGCv1.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

W_MAX = 4095            # max |weight code| (<= 16 significant bits total)
ACC_BUDGET = (1 << 24) - 1
ACT_MAX = 255           # unsigned 8-bit inter-layer activations
_DN = ("NDHWC", "DHWIO", "NDHWC")

# mantissa thresholds for round(8*log2(1+m/2^23)):
# T_j = round(2^23 * (2^((2j+1)/16) - 1)), j = 0..7
_LOG2_T = tuple(int(np.round((2.0 ** ((2 * j + 1) / 16.0) - 1) * 2 ** 23))
                for j in range(8))

# hyper-decoder layers: (param name, kind, input activation index)
# activation indices: 0 = zhat (scale 2^0, signed), 1..3 = hidden layers
_LAYERS = (
    ("deconv1", "conv", 0),
    ("deconv2", "deconv", 1),
    ("deconv3", "conv", 2),
    ("deconv4_1", "conv", 3),   # loc head
    ("deconv4_2", "conv", 3),   # scale head
)
N_HIDDEN = 3  # number of shipped activation scales (a_1..a_3)


def derive_weight_codes(hd_params):
    """Checkpoint weights -> integer weight codes (deterministic).

    Only order-independent reductions (max, integer sums) and elementwise
    f64 ops are used, so any platform derives identical codes from
    identical checkpoint bytes.

    Returns {layer: {"w_q": f32 kernel of integers, "b": int32 [Cout],
                     "bias": f32 [Cout]}}.
    """
    out = {}
    for name, _, ain in _LAYERS:
        w = np.asarray(hd_params[name]["kernel"], np.float64)
        bias = np.asarray(hd_params[name]["bias"], np.float32)
        cout = w.shape[-1]
        wf = w.reshape(-1, cout)
        mx = np.abs(wf).max(axis=0)                     # exact
        in_max = 127 if ain == 0 else ACT_MAX
        b = np.where(mx > 0,
                     np.floor(np.log2((W_MAX + 0.49) / np.maximum(mx, 1e-30))),
                     0.0).astype(np.int64)
        b = np.minimum(b, 24)                            # don't go absurd
        while True:
            w_q = np.round(wf * np.exp2(b.astype(np.float64))[None, :])
            ok = (np.abs(w_q).astype(np.int64).sum(axis=0) * in_max
                  <= ACC_BUDGET) & (np.abs(w_q).max(axis=0) <= W_MAX)
            if ok.all():
                break
            b = np.where(ok, b, b - 1)
        out[name] = {
            "w_q": w_q.reshape(w.shape).astype(np.float32),
            "b": b.astype(np.int32),
            "bias": bias,
        }
    return out


def _requant(acc, k):
    """clip(round(acc / 2^k)) with per-channel int32 shift k (k may be <=0).

    Round = half-away-from-zero-ish via add-half then arithmetic shift
    (floor((acc + 2^(k-1)) / 2^k)); exact left shift for k <= 0.
    """
    k = k.astype(jnp.int32)
    kp = jnp.clip(k, 1, 31)  # shifts >= 32 are UB; >>31 already yields 0/-1
    r = (acc + (jnp.int32(1) << (kp - 1))) >> kp
    l = acc << jnp.minimum(-k, 24).astype(jnp.int32)
    return jnp.where(k >= 1, r, l)


def _conv_int(x_int, layer, kind):
    """Exact integer conv in f32 (see module docstring); returns int32."""
    xf = x_int.astype(jnp.float32)
    w = jnp.asarray(layer["w_q"])
    if kind == "conv":
        y = lax.conv_general_dilated(
            xf, w, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=_DN, precision=lax.Precision.HIGHEST)
    else:  # stride-2 SAME transpose conv (flax ConvTranspose semantics)
        y = lax.conv_transpose(
            xf, w, strides=(2, 2, 2), padding="SAME",
            dimension_numbers=_DN, precision=lax.Precision.HIGHEST)
    return y.astype(jnp.int32)


def _bias_q(layer, scale_exp):
    """round(bias * 2^scale_exp) with dynamic per-channel exponent, int32.

    One f32 multiply + round per channel: correctly-rounded IEEE ops,
    deterministic on every backend.
    """
    e = jnp.clip(scale_exp, -30, 30).astype(jnp.float32)
    bq = jnp.round(jnp.asarray(layer["bias"]) * jnp.exp2(e))
    return jnp.clip(bq, -2.0 ** 30, 2.0 ** 30).astype(jnp.int32)


def q8log2(x):
    """round(8 * log2(x)) for int32 x >= 1, exact integer procedure."""
    f = x.astype(jnp.float32)            # exact for x < 2^24, monotone above
    bits = lax.bitcast_convert_type(f, jnp.int32)
    e = (bits >> 23) - 127
    m = bits & jnp.int32(0x7FFFFF)
    frac = jnp.zeros_like(m)
    for t in _LOG2_T:
        frac = frac + (m >= jnp.int32(t)).astype(jnp.int32)
    return 8 * e + frac


def apply_qprior(qweights, a_scales, zhat8):
    """zhat int8 [B,m,m,m,Cz] -> (loc_q int8, scale_q uint8), pure integer.

    a_scales: int32 [N_HIDDEN] activation scale exponents from calibration
    (dynamic input — changing them does not recompile).
    """
    a = a_scales.astype(jnp.int32)
    x = zhat8.astype(jnp.int32)
    a_in = jnp.int32(0)
    hidden = []
    for name, kind, ain in _LAYERS[:N_HIDDEN]:
        layer = qweights[name]
        b = jnp.asarray(layer["b"])
        acc = _conv_int(x, layer, kind) + _bias_q(layer, a_in + b)
        a_out = a[len(hidden)]
        x = jnp.clip(_requant(acc, a_in + b - a_out), 0, ACT_MAX)  # ReLU+sat
        hidden.append(x)
        a_in = a_out

    # loc head: round(loc * 8) = round(acc / 2^(a_in + b - 3))
    l1 = qweights["deconv4_1"]
    b1 = jnp.asarray(l1["b"])
    acc1 = _conv_int(x, l1, "conv") + _bias_q(l1, a_in + b1)
    loc_q = jnp.clip(_requant(acc1, a_in + b1 - 3), -127, 127).astype(jnp.int8)

    # scale head: scale = |acc| / 2^(a_in + b);
    # scale_q = clip(round(8*log2|acc|) - 8*(a_in + b) + 160, 0, 255)
    l2 = qweights["deconv4_2"]
    b2 = jnp.asarray(l2["b"])
    acc2 = jnp.abs(_conv_int(x, l2, "conv") + _bias_q(l2, a_in + b2))
    sq = q8log2(jnp.maximum(acc2, 1)) - 8 * (a_in + b2) + 160
    scale_q = jnp.where(acc2 == 0, 0, jnp.clip(sq, 0, 255)).astype(jnp.uint8)
    return loc_q, scale_q


def calibration_program(hd_module, hd_params, zhat8):
    """Float hyper-decoder forward that also returns per-layer max |act|.

    Encoder-side only (scales ship in the stream); does not need to be
    deterministic. Returns maxes for the N_HIDDEN hidden layers.
    """
    x = zhat8.astype(jnp.float32)
    params = hd_params
    maxes = []

    def conv(name, x):
        w = params[name]["kernel"].astype(jnp.float32)
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME", dimension_numbers=_DN
        ) + params[name]["bias"].astype(jnp.float32)

    def deconv(name, x):
        w = params[name]["kernel"].astype(jnp.float32)
        return lax.conv_transpose(
            x, w, (2, 2, 2), "SAME", dimension_numbers=_DN
        ) + params[name]["bias"].astype(jnp.float32)

    x = jax.nn.relu(conv("deconv1", x))
    maxes.append(jnp.max(jnp.abs(x)))
    x = jax.nn.relu(deconv("deconv2", x))
    maxes.append(jnp.max(jnp.abs(x)))
    x = jax.nn.relu(conv("deconv3", x))
    maxes.append(jnp.max(jnp.abs(x)))
    return jnp.stack(maxes)


def scales_from_maxes(maxes):
    """Activation maxes -> shipped scale exponents a_l (int, in [-8, 23])."""
    maxes = np.maximum(np.asarray(maxes, np.float64), 1e-12)
    a = np.floor(np.log2((ACT_MAX + 0.49) / maxes))
    return np.clip(a, -8, 23).astype(np.int32)
