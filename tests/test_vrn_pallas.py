"""Pallas VRN kernels match the flax VRNBlock (reference semantics).

The banded-matmul reformulation (ops/vrn_pallas.py) must be numerically
equivalent to the five-conv flax block — verified here in float32 through
the Pallas interpreter so it runs on the CPU test backend.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgcv1_tpu.models.voxception import VRNBlock
from pcgcv1_tpu.ops import vrn_pallas


@pytest.mark.parametrize("c,width", [(16, 8), (32, 8), (16, 14)])
def test_vrn_pallas_matches_flax(c, width):
    rng = np.random.default_rng(c + width)
    x = rng.normal(0, 1, (2, width, width, width, c)).astype(np.float32)
    block = VRNBlock(filters=c, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ref = np.asarray(block.apply({"params": params}, jnp.asarray(x)))

    tables = vrn_pallas.build_vrn_tables(params, width, dtype=jnp.float32)
    got = np.asarray(vrn_block_apply(x, tables))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def vrn_block_apply(x, tables):
    return jax.jit(lambda a: vrn_pallas.vrn_block_pallas(
        a, tables, interpret=True))(jnp.asarray(x))


def test_tables_static_metadata():
    block = VRNBlock(filters=16, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 8, 16))
    params = block.init(jax.random.PRNGKey(1), x)["params"]
    t = vrn_pallas.build_vrn_tables(params, 8)
    assert t["c"] == 16 and t["width"] == 8
    # tables are segmented into per-output-block banded windows
    # [dz, dy, seg, ws, block]; at width 8 everything is one segment
    assert t["t11"].shape == (3, 3, 1, vrn_pallas._align(12 * 16, 128),
                              vrn_pallas._align(10 * 4, 128))
    assert t["t11_starts"] == (0,)
    assert t["t12"].shape[2] == 1 and t["t12"].shape[-1] == 8 * 16
