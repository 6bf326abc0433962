"""Transform shape/behavior tests (reference self-checks,
model_voxception.py:310-336, as a real suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgcv1_tpu.models import get_model


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestVoxception:
    def test_shapes(self, key):
        # 32^3 input: the transforms are fully convolutional, so every
        # shape relation is exercised at 1/8 the CPU compile cost of 64^3
        # (the 64^3 path is covered by the slow-tier end-to-end tests)
        fam = get_model("voxception")
        mods = fam.make(hyper=True)
        x = jnp.zeros((2, 32, 32, 32, 1))
        pa = mods["analysis"].init(key, x)
        y = mods["analysis"].apply(pa, x)
        assert y.shape == (2, 8, 8, 8, 16)
        ps = mods["synthesis"].init(key, y)
        out = mods["synthesis"].apply(ps, y)
        assert out.shape == (2, 32, 32, 32, 1)
        phe = mods["hyper_encoder"].init(key, y)
        z = mods["hyper_encoder"].apply(phe, y)
        assert z.shape == (2, 4, 4, 4, 8)
        phd = mods["hyper_decoder"].init(key, z)
        loc, scale = mods["hyper_decoder"].apply(phd, z)
        assert loc.shape == (2, 8, 8, 8, 16)
        assert scale.shape == (2, 8, 8, 8, 16)
        assert bool(jnp.all(scale >= 0))

    def test_fully_convolutional(self, key):
        # arbitrary cube sizes (the reference's cube_size 32/128 ablation)
        fam = get_model("voxception")
        mods = fam.make()
        x16 = jnp.zeros((1, 16, 16, 16, 1))
        pa = mods["analysis"].init(key, x16)
        y32 = mods["analysis"].apply(pa, jnp.zeros((1, 32, 32, 32, 1)))
        assert y32.shape == (1, 8, 8, 8, 16)

    def test_bfloat16_compute(self, key):
        fam = get_model("voxception")
        mods = fam.make(dtype=jnp.bfloat16)
        x = jax.random.uniform(key, (1, 16, 16, 16, 1))
        pa = mods["analysis"].init(key, x)
        y = mods["analysis"].apply(pa, x)
        assert y.dtype == jnp.float32  # outputs cast back

    def test_alias(self):
        assert get_model("models.model_voxception").name == "voxception"


class TestSubpixel:
    """Polyphase deconv lowering (models/subpixel.py) is the same function
    as nn.ConvTranspose(k=3, s=2, SAME) on the same parameter tree."""

    def test_primitive_matches_convtranspose(self, key):
        import flax.linen as nn
        from pcgcv1_tpu.models.subpixel import conv_transpose_subpixel
        x = jax.random.normal(key, (2, 5, 5, 5, 12))
        m = nn.ConvTranspose(6, (3, 3, 3), strides=(2, 2, 2),
                             padding="SAME")
        p = m.init(key, x)
        ref = m.apply(p, x)
        got = conv_transpose_subpixel(x, p["params"]["kernel"],
                                      p["params"]["bias"])
        assert got.shape == ref.shape == (2, 10, 10, 10, 6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_synthesis_poly_same_params_same_output(self, key):
        fam = get_model("voxception")
        y = jax.random.normal(key, (1, 4, 4, 4, 16))
        ref_mod = fam.make()["synthesis"]
        params = ref_mod.init(key, y)
        ref = ref_mod.apply(params, y)
        poly_mod = fam.make(deconv="poly")["synthesis"]
        got = poly_mod.apply(params, y)  # identical parameter tree
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestSimple:
    def test_shapes(self, key):
        fam = get_model("simple")
        mods = fam.make()
        x = jnp.zeros((2, 32, 32, 32, 1))
        pa = mods["analysis"].init(key, x)
        y = mods["analysis"].apply(pa, x)
        assert y.shape == (2, 4, 4, 4, 32)
        ps = mods["synthesis"].init(key, y)
        out = mods["synthesis"].apply(ps, y)
        assert out.shape == (2, 32, 32, 32, 1)

    def test_no_hyper(self):
        with pytest.raises(ValueError):
            get_model("simple").make(hyper=True)


@pytest.mark.slow
def test_param_count_order_of_magnitude(key):
    # the reference transforms are sub-1M-param CNNs (SURVEY.md §2)
    fam = get_model("voxception")
    mods = fam.make(hyper=True)
    x = jnp.zeros((1, 64, 64, 64, 1))
    pa = mods["analysis"].init(key, x)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(pa))
    assert 100_000 < n < 2_000_000
