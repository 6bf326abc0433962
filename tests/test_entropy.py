"""Entropy models: JAX likelihoods vs C++ coder agreement.

The load-bearing invariant: the rate the device-side likelihood predicts
(training objective) must match what the native coder actually spends, and
the native quantized CDFs must integrate the same density the JAX model
defines.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgcv1_tpu import native
from pcgcv1_tpu.entropy import FactorizedEntropy, conditional
from pcgcv1_tpu.entropy.factorized import export_cdf_weights


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(7)


class TestFactorized:
    def test_call_shapes_and_modes(self, key):
        eb = FactorizedEntropy(channels=8)
        x = jax.random.normal(key, (2, 4, 4, 4, 8)) * 3
        params = eb.init({"params": key, "noise": key}, x, training=True)
        vals, lik = eb.apply(params, x, training=False)
        assert np.array_equal(np.asarray(vals), np.round(np.asarray(x)))
        assert lik.shape == x.shape
        assert bool(jnp.all(lik >= 1e-9)) and bool(jnp.all(lik <= 1.0))
        vals_n, _ = eb.apply(params, x, training=True,
                             rngs={"noise": jax.random.PRNGKey(1)})
        assert bool(jnp.all(jnp.abs(vals_n - x) <= 0.5))

    def test_density_normalizes(self, key):
        # sum of likelihoods over a wide symbol range ~ 1 per channel
        eb = FactorizedEntropy(channels=4)
        x = jnp.zeros((1, 1, 1, 1, 4))
        params = eb.init({"params": key}, x, training=False)
        grid = jnp.arange(-300, 301, dtype=jnp.float32)
        vals = jnp.tile(grid[:, None], (1, 4)).reshape(-1, 4)
        _, lik = eb.apply(params, vals, training=False)
        sums = np.asarray(lik).reshape(len(grid), 4).sum(axis=0)
        np.testing.assert_allclose(sums, 1.0, atol=3e-3)

    def test_predicted_rate_matches_coded_rate(self, key):
        """The native coder's output must match the rate implied by its own
        quantized tables within ~0.5%, and those tables must integrate the
        same density the JAX model defines (coded rate <= the full-support
        likelihood estimate, since the C++ side renormalizes over the
        truncated symbol range — strictly better than the training bound)."""
        C = 8
        eb = FactorizedEntropy(channels=C)
        x = jax.random.normal(key, (4, 8, 8, 8, C)) * 4.0
        params = eb.init({"params": key}, x, training=False)
        vals, lik = eb.apply(params, x, training=False)
        bits_pred = float(-jnp.sum(jnp.log2(lik)))

        v = np.asarray(vals).astype(np.int32)
        mn, mx = int(v.min()), int(v.max())
        mats, biases, factors, dims = export_cdf_weights(params["params"])
        q = native.factorized_cdf(mats, biases, factors, dims, mn, mx)
        symbols = (v.reshape(-1, C) - mn)
        s = native.cdf_encode(symbols, q)
        bits_actual = 8 * len(s)

        # (a) coder matches its own tables almost exactly
        freqs = np.diff(q.astype(np.int64), axis=1) / 65536.0
        ch = np.tile(np.arange(C), symbols.shape[0])
        bits_table = float(-np.log2(freqs[ch, symbols.reshape(-1)]).sum())
        assert abs(bits_actual - bits_table) / bits_table < 0.005

        # (b) C++ tables = JAX density, renormalized over [mn, mx]: the
        # in-range mass per channel explains the entire gap to bits_pred.
        grid = jnp.arange(mn, mx + 1, dtype=jnp.float32)
        gv = jnp.tile(grid[:, None], (1, C))
        _, gl = eb.apply(params, gv, training=False)
        mass = np.asarray(gl).sum(axis=0)  # [C] in-range mass
        bits_pred_renorm = bits_pred + float(
            np.log2(mass)[None, :].repeat(symbols.shape[0], 0).sum())
        assert abs(bits_actual - bits_pred_renorm) / bits_pred_renorm < 0.01
        assert bits_actual < bits_pred  # renormalization only helps

        back = native.cdf_decode(s, symbols.shape[0], q) + mn
        assert np.array_equal(back, v.reshape(-1, C))


class TestConditional:
    def test_likelihood_matches_coded_rate(self, key):
        n = 50000
        rng = np.random.default_rng(5)
        loc = rng.normal(0, 2, n).astype(np.float32)
        scale = (np.abs(rng.normal(1.0, 0.5, n)) + 0.05).astype(np.float32)
        y = rng.laplace(loc, scale).astype(np.float32)
        vals, lik = conditional.apply(jnp.asarray(y), jnp.asarray(loc),
                                      jnp.asarray(scale), training=False)
        bits_pred = float(-jnp.sum(jnp.log2(lik)))
        v = np.asarray(vals).astype(np.int32)
        s = native.laplace_encode(v, loc, scale, int(v.min()), int(v.max()))
        assert abs(8 * len(s) - bits_pred) / bits_pred < 0.02

    def test_symmetry(self):
        # likelihood(loc + d) == likelihood(loc - d)
        loc = jnp.float32(0.3)
        lik_r = conditional.likelihood(jnp.float32(2.3), loc, 1.0)
        lik_l = conditional.likelihood(jnp.float32(-1.7), loc, 1.0)
        np.testing.assert_allclose(float(lik_r), float(lik_l), rtol=1e-6)

    def test_scale_lower_bound(self):
        vals, lik = conditional.apply(
            jnp.zeros(4), jnp.zeros(4), jnp.zeros(4), training=False)
        assert np.all(np.isfinite(np.asarray(lik)))
