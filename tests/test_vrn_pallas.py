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


@pytest.mark.parametrize("variant", ["planes", "merged"])
@pytest.mark.parametrize("c,width", [(16, 8), (32, 8), (16, 14)])
def test_vrn_pallas_matches_flax(c, width, variant):
    rng = np.random.default_rng(c + width)
    x = rng.normal(0, 1, (2, width, width, width, c)).astype(np.float32)
    block = VRNBlock(filters=c, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ref = np.asarray(block.apply({"params": params}, jnp.asarray(x)))

    tables = vrn_pallas.build_vrn_tables(params, width, dtype=jnp.float32)
    got = np.asarray(vrn_block_apply(x, tables, variant))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def vrn_block_apply(x, tables, variant="merged"):
    return jax.jit(lambda a: vrn_pallas.vrn_block_pallas(
        a, tables, interpret=True, variant=variant))(jnp.asarray(x))


@pytest.mark.slow
def test_full_transforms_match_flax():
    """apply_analysis/apply_synthesis (the codec's vrn='pallas' path) must
    match the flax AnalysisTransform/SynthesisTransform at f32."""
    from pcgcv1_tpu.models.voxception import (AnalysisTransform,
                                              SynthesisTransform)
    cs = 16
    rng = np.random.default_rng(9)
    x = (rng.random((1, cs, cs, cs, 1)) < 0.1).astype(np.float32)
    ana = AnalysisTransform(dtype=jnp.float32)
    pa = ana.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"]
    y_ref = np.asarray(ana.apply({"params": pa}, jnp.asarray(x)))
    ta = vrn_pallas.build_transform_tables("analysis", pa, cs,
                                           dtype=jnp.float32)
    y_got = np.asarray(jax.jit(lambda a: vrn_pallas.apply_analysis(
        pa, ta, a, dtype=jnp.float32, interpret=True))(jnp.asarray(x)))
    np.testing.assert_allclose(y_got, y_ref, rtol=2e-4, atol=2e-4)

    syn = SynthesisTransform(dtype=jnp.float32)
    y = rng.normal(0, 1, (1, cs // 4, cs // 4, cs // 4, 16)).astype(
        np.float32)
    ps = syn.init(jax.random.PRNGKey(3), jnp.asarray(y))["params"]
    x_ref = np.asarray(syn.apply({"params": ps}, jnp.asarray(y)))
    ts = vrn_pallas.build_transform_tables("synthesis", ps, cs,
                                           dtype=jnp.float32)
    x_got = np.asarray(jax.jit(lambda a: vrn_pallas.apply_synthesis(
        ps, ts, a, dtype=jnp.float32, interpret=True))(jnp.asarray(y)))
    np.testing.assert_allclose(x_got, x_ref, rtol=2e-4, atol=3e-4)


@pytest.mark.slow
def test_codec_pallas_flag_streams_match():
    """PointCloudCodec(vrn='pallas') produces the same factorized streams
    as the XLA path at f32 (the rounded latents must agree exactly)."""
    import warnings
    from pcgcv1_tpu.codec.transforms import PointCloudCodec
    rng = np.random.default_rng(5)
    pts = np.unique(np.clip(np.round(rng.normal(8, 4, (2000, 3))),
                            0, 15).astype(np.int32), axis=0)
    from pcgcv1_tpu.codec import pipeline
    pre = pipeline.preprocess_points(pts, cube_size=16, min_num=10)
    assert pre.cubes.shape[0] == 1  # interpret mode: keep it tiny
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        xla = PointCloudCodec(mode="factorized", chunk=1, cube_size=16)
        pal = PointCloudCodec(mode="factorized", chunk=1, cube_size=16,
                              vrn="pallas")
    pal.params = xla.params
    s_x, mn_x, mx_x, shape = xla.compress_factorized(pre.cubes)
    s_p, mn_p, mx_p, _ = pal.compress_factorized(pre.cubes)
    assert (mn_p, mx_p) == (mn_x, mx_x)
    assert s_p == s_x
    # decode through the pallas synthesis as well
    lg_x = xla.decompress_factorized(s_x, mn_x, mx_x, shape)
    lg_p = pal.decompress_factorized(s_x, mn_x, mx_x, shape)
    np.testing.assert_allclose(lg_p, lg_x, rtol=2e-4, atol=2e-4)


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
