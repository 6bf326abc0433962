"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The axon TPU plugin registers itself via sitecustomize and overrides
JAX_PLATFORMS through jax.config, so env vars alone don't stick — we
override back through jax.config after import. Set PCGC_TEST_TPU=1 to run
the suite on the real device instead.
"""

import os

import jax

if not os.environ.get("PCGC_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

from pcgcv1_tpu.utils.jaxcache import enable_cache

enable_cache()


def pytest_collection_modifyitems(items):
    """Every test not marked slow is the fast tier: `pytest -m fast`
    runs a <2-min core pass over every module; `pytest tests/` runs all.
    """
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_cloud(rng, n=20000, res=256):
    """A blobby synthetic point cloud: unique int coords in [0, res)."""
    centers = rng.integers(res // 8, res - res // 8, size=(8, 3))
    pts = []
    for c in centers:
        pts.append(rng.normal(c, res / 16, size=(n // 8, 3)))
    pts = np.concatenate(pts)
    pts = np.clip(np.round(pts), 0, res - 1).astype(np.int32)
    return np.unique(pts, axis=0)


@pytest.fixture
def cloud(rng):
    return random_cloud(rng)
