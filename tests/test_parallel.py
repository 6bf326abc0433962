"""Mesh/sharding helpers and the codec on a sharded mesh."""

import numpy as np

import jax

from pcgcv1_tpu.parallel import make_mesh, shard_params


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh2 = make_mesh()  # all devices on data axis
    assert mesh2.shape["data"] == jax.device_count()


def test_shard_params_tp_specs():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "conv_kernel": np.zeros((3, 3, 3, 16, 32), np.float32),
        "small_kernel": np.zeros((3, 3, 3, 1, 3), np.float32),
        "bias": np.zeros((32,), np.float32),
    }
    sh = shard_params(params, mesh)
    assert "model" in str(sh["conv_kernel"].spec)
    assert sh["small_kernel"].spec == jax.sharding.PartitionSpec()
    assert sh["bias"].spec == jax.sharding.PartitionSpec()


def test_codec_on_data_mesh():
    """Sharded inference: chunks split over the data axis."""
    import warnings
    from pcgcv1_tpu.codec.transforms import PointCloudCodec

    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(0)
    cubes = (rng.random((16, 16, 16, 16, 1)) < 0.05).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        codec = PointCloudCodec(mode="hyper", chunk=8, cube_size=16,
                                mesh=mesh)
        codec_ref = PointCloudCodec(mode="hyper", chunk=8, cube_size=16)
    hs = codec.compress_hyper(cubes)
    hs_ref = codec_ref.compress_hyper(cubes)
    # same weights (same seed) -> identical latent symbols either way
    assert np.array_equal(hs.y_min_vs, hs_ref.y_min_vs)
    logits = codec.decompress_hyper(hs)
    assert logits.shape == cubes.shape
