"""Numpy-backed random parameter init (zero XLA compiles).

Random-initializing the model tree through flax costs either hundreds of
tiny XLA programs (eager ``module.init``) or one very large fused one
(jitted): on a cold-cache single-core host either path costs minutes of
compile time before the first real step (measured 274 s eager / ~360 s
jitted for the hyper voxception tree). Since random init needs the right
*distributions*, not any particular bits, this module fills a
``jax.eval_shape`` skeleton with numpy-sampled values matching the
modules' initializer distributions exactly:

- ``kernel``      -> flax default ``lecun_normal``: truncated normal on
  (-2, 2) sigma with stddev sqrt(1/fan_in)/k, k the truncation variance
  correction (jax.nn.initializers.variance_scaling).
- ``bias``        -> zeros (flax Conv/ConvTranspose default).
- ``matrix_{i}``  -> the FactorizedEntropy constant
  log(expm1(1/scale_k/dims[i+1])) (entropy/factorized.py setup;
  reference models/entropy_model.py init).
- ``bias_{i}``    -> U(-0.5, 0.5) (FactorizedEntropy).
- ``factor_{i}``  -> zeros (FactorizedEntropy).

Total cost: milliseconds, any host, any backend.
"""

from __future__ import annotations

import numpy as np

# variance correction of the (-2, 2)-truncated standard normal, as used by
# jax.nn.initializers.variance_scaling(..., "truncated_normal")
_TRUNC_STD = 0.8796256610342398


def _truncated_normal(rng, shape, stddev):
    """N(0, stddev^2) truncated to (-2, 2) sigma, variance-corrected the
    same way as jax.nn.initializers.truncated_normal."""
    out = rng.standard_normal(size=shape)
    bad = np.abs(out) > 2.0
    while bad.any():
        out[bad] = rng.standard_normal(size=int(bad.sum()))
        bad = np.abs(out) > 2.0
    return out * (stddev / _TRUNC_STD)


def numpy_init(abstract_params, seed=0,
               est_filters=(3, 3, 3), est_init_scale=8.0):
    """Fill an eval_shape parameter skeleton with numpy-sampled values.

    abstract_params: the tree returned by jax.eval_shape over the flax
    init (leaves carry .shape/.dtype). Returns a tree of numpy arrays with
    the same structure; jit/device_put moves them to the device lazily.
    """
    rng = np.random.default_rng(seed)
    dims = (1,) + tuple(est_filters) + (1,)
    k = len(est_filters) + 1
    scale_k = est_init_scale ** (1.0 / k)

    import jax

    def leaf(path, s):
        name = None
        for entry in reversed(path):
            key = getattr(entry, "key", None)
            if key is not None:
                name = str(key)
                break
        shape, dtype = tuple(s.shape), s.dtype
        if name == "kernel":
            fan_in = int(np.prod(shape[:-1])) or 1
            v = _truncated_normal(rng, shape, np.sqrt(1.0 / fan_in))
        elif name is not None and name.startswith("matrix_"):
            i = int(name.split("_")[1])
            v = np.full(shape,
                        float(np.log(np.expm1(
                            1.0 / scale_k / dims[i + 1]))))
        elif name is not None and name.startswith("factor_"):
            v = np.zeros(shape)
        elif name is not None and name.startswith("bias_"):
            v = rng.uniform(-0.5, 0.5, size=shape)
        elif name == "bias":
            v = np.zeros(shape)
        else:
            raise ValueError(
                f"numpy_init: unrecognized parameter {name!r} at "
                f"{jax.tree_util.keystr(path)} — add an init rule")
        return np.asarray(v, dtype)

    return jax.tree_util.tree_map_with_path(leaf, abstract_params)
