"""Device-side order-2 spline rotation: scipy parity + streamed valley/ridge.

The streamed valley/ridge path exists for the reference's own 20-100 km
example scales (scripts/compute_topo_descriptors.py:63-72), where the static
rotated bank would be 1.9-48 GB. These tests pin its pieces at small sizes:

* the spline prefilter vs ``scipy.ndimage.spline_filter`` (order 2, the
  mode='constant' boundary resolution);
* whole-angle rotation + masked re-standardization vs the host
  ``rotate_kernels`` (which wraps scipy.ndimage.rotate, reference
  topo.py:521-531);
* the streamed op vs the static-bank op end to end;
* the size-based auto-routing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from topo_descriptors_tpu.config import CFG
from topo_descriptors_tpu.io.synthetic import synthetic_dem
from topo_descriptors_tpu.kernels.valley import (
    rotate_kernels,
    rotated_extent,
    valley_kernels,
)
from topo_descriptors_tpu.ops.spline_rotate import (
    exact_deg_trig,
    prefilter2d_o2,
    rotate_std_canvas,
    rotation_params,
)
from topo_descriptors_tpu.ops.valley_ridge import (
    bank_nbytes,
    valley_ridge,
    valley_ridge_streamed,
)


def test_prefilter_matches_scipy():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 41, 53)).astype(np.float32)
    ref = np.stack(
        [
            ndimage.spline_filter(p.astype(np.float64), order=2, mode="constant")
            for p in x
        ]
    )
    mine = np.asarray(prefilter2d_o2(jnp.asarray(x)))
    np.testing.assert_allclose(mine, ref, rtol=0, atol=1e-5 * np.abs(ref).max())


def test_exact_deg_trig_quadrants():
    assert exact_deg_trig(0.0) == (1.0, 0.0)
    assert exact_deg_trig(90.0) == (0.0, 1.0)
    assert exact_deg_trig(180.0) == (-1.0, 0.0)
    assert exact_deg_trig(450.0) == (0.0, 1.0)
    c, s = exact_deg_trig(30.0)
    assert abs(s - 0.5) < 1e-12


@pytest.mark.parametrize("size", [9, 31])
def test_device_rotation_matches_scipy(size):
    base = valley_kernels(size, (0, 0.15, 0.3))
    ky_max, kx_max = rotated_extent(size)
    filt = prefilter2d_o2(jnp.asarray(base))
    rot = jax.jit(lambda f, p: rotate_std_canvas(f, p, (ky_max, kx_max)))
    for angle in (0.0, 13.0, 45.0, 90.0, 137.0, 179.0):
        params = rotation_params(size, angle, ky_max, kx_max)
        dev = np.asarray(rot(filt, jnp.asarray(params)))
        host = rotate_kernels(base, angle)
        _, ky, kx = host.shape
        lo_y = (ky_max - 1) // 2 - (ky - 1) // 2
        lo_x = (kx_max - 1) // 2 - (kx - 1) // 2
        canvas = np.zeros((3, ky_max, kx_max), np.float32)
        canvas[:, lo_y : lo_y + ky, lo_x : lo_x + kx] = host
        np.testing.assert_allclose(dev, canvas, rtol=0, atol=1e-4)


def test_streamed_matches_static_bank():
    dem = jnp.asarray(synthetic_dem(96, 120, seed=5))
    ref_n, ref_d = valley_ridge(dem, 15, "valley", (0, 0.2), method="fft")
    st_n, st_d = valley_ridge_streamed(dem, 15, "valley", (0, 0.2))
    scale = float(jnp.max(jnp.abs(ref_n)))
    np.testing.assert_allclose(
        np.asarray(st_n), np.asarray(ref_n), rtol=0, atol=2e-5 * scale
    )
    # direction may differ only on near-ties between adjacent angles
    assert float(jnp.mean((st_d != ref_d).astype(jnp.float32))) < 0.01


def test_streamed_with_smoothing_and_stats():
    dem = jnp.asarray(synthetic_dem(80, 96, seed=6))
    ref = valley_ridge(dem, 15, "ridge", (0, 0.15), sigma=1.5, method="fft")
    st = valley_ridge_streamed(dem, 15, "ridge", (0, 0.15), sigma=1.5)
    scale = float(jnp.max(jnp.abs(ref[0])))
    np.testing.assert_allclose(
        np.asarray(st[0]), np.asarray(ref[0]), rtol=0, atol=2e-5 * scale
    )


def test_auto_routes_large_banks_to_streamed(monkeypatch):
    # shrink the budget so a small test size crosses the routing threshold
    dem = jnp.asarray(synthetic_dem(64, 64, seed=7))
    assert bank_nbytes(15, 2) > 100
    monkeypatch.setattr(CFG, "valley_bank_max_bytes", 100)
    routed = valley_ridge(dem, 15, "valley", (0, 0.2))
    explicit = valley_ridge_streamed(dem, 15, "valley", (0, 0.2))
    np.testing.assert_array_equal(np.asarray(routed[0]), np.asarray(explicit[0]))


def test_bank_nbytes_matches_reference_scales():
    # the reference's 100 km scale at 30 m resolution: a ~48 GB bank
    assert bank_nbytes(3335, 3) > 40e9
    assert bank_nbytes(15, 3) < 1e6
