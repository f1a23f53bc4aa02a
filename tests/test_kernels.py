"""Kernel-weight library: disks, Gaussian taps, Sobel, valley banks, Sx geometry.

The Sx geometry goldens are the reference's own unit vectors
(reference test/test_topo.py:6-67), ported as-is per the parity contract.
"""

import numpy as np
import pytest
from scipy import ndimage

from topo_descriptors_tpu import kernels


def test_circular_kernel_square_below_5():
    for size in (1, 2, 3, 4):
        k = kernels.circular_kernel(size)
        assert k.shape == (size, size)
        assert (k == 1).all()
        assert k.dtype == np.float32


def test_circular_kernel_disk():
    k = kernels.circular_kernel(7)
    mid = 3
    yy, xx = np.mgrid[:7, :7]
    expected = ((yy - mid) ** 2 + (xx - mid) ** 2 <= mid * mid).astype(np.float32)
    np.testing.assert_array_equal(k, expected)
    kc = kernels.circular_kernel(7, exclude_center=True)
    assert kc[mid, mid] == 0
    assert kc.sum() == k.sum() - 1


def test_gaussian_taps_match_scipy_impulse():
    for sigma in (0.6, 1.0, 2.5, 7.3):
        taps = kernels.gaussian_kernel1d(sigma)
        r = (len(taps) - 1) // 2
        impulse = np.zeros(4 * r + 1)
        impulse[2 * r] = 1.0
        ref = ndimage.gaussian_filter1d(impulse, sigma)
        np.testing.assert_allclose(taps, ref[r : 3 * r + 1], rtol=1e-12, atol=1e-15)


def test_sobel_kernel():
    k = kernels.sobel_kernel()
    assert k.sum() == 0
    assert np.abs(k).sum() == pytest.approx(1.0)
    np.testing.assert_array_equal(k * 8, [[1, 0, -1], [2, 0, -2], [1, 0, -1]])


def test_valley_kernels_standardized():
    bank = kernels.valley_kernels(9, [0, 0.15, 0.3])
    assert bank.shape == (3, 9, 9)
    np.testing.assert_allclose(bank.mean(axis=(1, 2)), 0.0, atol=1e-6)
    np.testing.assert_allclose(bank.std(axis=(1, 2)), 1.0, rtol=1e-6)
    # columns identical (kernel is a function of the row only)
    np.testing.assert_allclose(bank[0, :, 0], bank[0, :, 5], atol=1e-7)
    # V shape: centre row is the minimum for flat=0
    assert bank[0, 4, 0] == bank[0].min()
    # ridge = -valley
    ridge = kernels.ridge_kernels(9, [0, 0.15, 0.3])
    np.testing.assert_allclose(ridge, -bank)


def test_rotate_kernels_properties():
    bank = kernels.valley_kernels(9, [0, 0.3])
    rot = kernels.rotate_kernels(bank, 45.0)
    assert rot.dtype == np.float32
    assert rot.shape[0] == 2
    assert rot.shape[1] > 9  # reshape=True grows support
    # rotating by 0 degrees returns the (re-standardized) bank unchanged
    rot0 = kernels.rotate_kernels(bank, 0.0)
    np.testing.assert_allclose(rot0, bank, atol=1e-5)
    # 90-degree rotation is an exact transpose-flip of the grid
    rot90 = kernels.rotate_kernels(bank, 90.0)
    np.testing.assert_allclose(rot90[0], np.rot90(bank[0]), atol=1e-4)


# --- Sx geometry goldens (reference test/test_topo.py) -----------------------


def test_sx_distance_reference_golden():
    output = kernels.sx_distance(150.0, 50.0, 40.0)
    expected_first_row = np.array(
        [
            256.1249695,
            219.31712199,
            188.67962264,
            167.63054614,
            160.0,
            167.63054614,
            188.67962264,
            219.31712199,
            256.1249695,
        ]
    )
    assert np.all(np.isclose(output[0, :], expected_first_row))
    assert output.dtype == np.float64


def test_sx_bresenhamlines_reference_golden():
    start = np.array([[8, 9], [17, 22]])
    end = np.array([15, 15])
    output = kernels.sx_bresenhamlines(start, end)
    expected = np.array(
        [
            [9, 10],
            [10, 11],
            [11, 12],
            [12, 12],
            [13, 13],
            [14, 14],
            [17, 21],
            [16, 20],
            [16, 19],
            [16, 18],
            [16, 17],
            [15, 16],
        ]
    )
    assert np.all(output == expected)
    assert output.dtype == np.int64


def test_sx_source_idx_delta_reference_golden():
    azimuths = np.array([3.0, 4.0, 5.0, 6.0])
    output = kernels.sx_source_idx_delta(azimuths, 500, 20, 30)
    expected = np.array([[17, 1], [17, 2], [17, 2], [17, 3]])
    assert np.all(output == expected)
    assert output.dtype == np.int64


def test_sx_offsets_consistency():
    offsets, distances, border = kernels.sx_offsets(
        azimuth=0.0, radius=200.0, dx=30.0, dy=30.0
    )
    assert offsets.shape[0] == distances.shape[0]
    assert np.abs(offsets).max() <= border
    # azimuth 0: delta_y = rint(r/dy * cos 0) > 0 -> all row offsets positive
    # (reference topo.py:887 convention)
    assert offsets[:, 0].min() > 0
    valid = ~np.isnan(distances)
    assert (distances[valid] > 0).all()


def test_sx_offsets_radius_min_masks_near_pixels():
    offs_all, dist_all, _ = kernels.sx_offsets(0.0, 200.0, 30.0, 30.0)
    offs_min, dist_min, _ = kernels.sx_offsets(0.0, 200.0, 30.0, 30.0, radius_min=100.0)
    np.testing.assert_array_equal(offs_all, offs_min)
    assert np.isnan(dist_min).sum() > np.isnan(dist_all).sum()
