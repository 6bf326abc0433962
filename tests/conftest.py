"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before the first jax import anywhere in the test
process, hence module-level side effects here.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

from pcgcv1_tpu.utils.jaxcache import enable_cache

enable_cache()


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
