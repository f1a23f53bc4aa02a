"""Test configuration.

Tests run on CPU with 8 virtual XLA host devices so the sharded/multi-chip
paths (2-D mesh + halo exchange) are exercised without TPU hardware, per the
driver contract. Must run before the first ``import jax`` anywhere.
"""

import os
import sys

# make tests/ importable (oracles.py) even under pytest's importlib mode
sys.path.insert(0, os.path.dirname(__file__))

# force CPU regardless of inherited env (the session env pins the TPU platform)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the image's sitecustomize registers the TPU plugin and pins jax_platforms
# explicitly, which beats the env var — override it back after import
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


# NOTE: each DEM fixture owns its rng. A shared session rng would make the
# fixture contents depend on *which tests run* (fixture creation order
# advances the stream), turning marginal tolerance tests flaky under
# subset selection (pytest tests/test_x.py vs the full suite).


@pytest.fixture(scope="session")
def dem_small():
    """A smooth synthetic DEM, float32, Alpine-like value range."""
    from scipy import ndimage

    noise = np.random.default_rng(42).standard_normal((72, 96))
    smooth = ndimage.gaussian_filter(noise, 6.0)
    dem = 1500.0 + 900.0 * smooth / np.abs(smooth).max()
    return dem.astype(np.float32)


@pytest.fixture(scope="session")
def dem_tiny():
    from scipy import ndimage

    noise = np.random.default_rng(43).standard_normal((40, 48))
    smooth = ndimage.gaussian_filter(noise, 4.0)
    dem = 1200.0 + 700.0 * smooth / np.abs(smooth).max()
    return dem.astype(np.float32)
