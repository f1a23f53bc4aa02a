"""Grid/geo helpers: odd rounding, UTM projection, scale conversion, sigmas.

Includes the reference's golden vector for round_up_to_odd
(reference test/test_helpers.py:6-11).
"""

import numpy as np
import pytest

from topo_descriptors_tpu import geo
from topo_descriptors_tpu.grid import Raster, RasterGrid, fill_na


def test_round_up_to_odd_reference_golden():
    inputs = np.arange(0.1, 10, 0.7)
    outputs = geo.round_up_to_odd(inputs)
    expected = [1, 1, 1, 3, 3, 3, 5, 5, 5, 7, 7, 7, 9, 9, 9]
    assert outputs.dtype == np.int64
    assert list(outputs) == expected


def test_utm_central_meridian():
    # on a zone's central meridian the easting is exactly 500000
    east, north = geo.utm_from_latlon(45.0, 9.0)  # zone 32, central lon 9
    assert east == pytest.approx(500000.0, abs=1e-6)
    assert north > 0


def test_utm_known_location():
    # Eiffel Tower: 48.8583 N, 2.2945 E -> UTM 31N ~ (448252 E, 5411944 N)
    east, north = geo.utm_from_latlon(48.8583, 2.2945)
    assert east == pytest.approx(448252, abs=30)
    assert north == pytest.approx(5411944, abs=30)


def test_utm_northing_vs_meridian_arc_quadrature():
    # independent check of the projection series: on the central meridian the
    # northing is exactly k0 * meridian arc length, computed here by direct
    # numerical integration of the WGS84 meridian curvature radius
    from scipy.integrate import quad

    a_wgs = 6378137.0
    e2 = 0.00669438
    for lat in (10.0, 46.4, 70.0):
        arc, _ = quad(
            lambda p: a_wgs * (1 - e2) / (1 - e2 * np.sin(p) ** 2) ** 1.5,
            0.0,
            np.radians(lat),
            epsabs=1e-6,
        )
        east, north = geo.utm_from_latlon(lat, 9.0)  # zone 32 central meridian
        assert east == pytest.approx(500000.0, abs=1e-6)
        assert north == pytest.approx(0.9996 * arc, abs=0.5)


def test_utm_southern_hemisphere_offset():
    east_n, north_n = geo.utm_from_latlon(5.0, 9.0)
    east_s, north_s = geo.utm_from_latlon(-5.0, 9.0)
    assert north_s == pytest.approx(10000000 - north_n, rel=1e-9)


def test_utm_zone_numbers():
    assert geo.latlon_to_zone_number(46.5, 8.4) == 32
    assert geo.latlon_to_zone_number(0.0, -180.0) == 1
    assert geo.latlon_to_zone_number(0.0, 179.9) == 60
    # Norway exception
    assert geo.latlon_to_zone_number(60.0, 5.0) == 32
    # Svalbard exception
    assert geo.latlon_to_zone_number(78.0, 20.0) == 33


def _projected_dem(ny=40, nx=50, res=50.0):
    y = np.arange(ny, dtype=np.float64)[::-1] * res
    x = np.arange(nx, dtype=np.float64) * res
    grid = RasterGrid(y=y, x=x, crs="epsg:21781")
    data = np.zeros((ny, nx), dtype=np.float32)
    return Raster(data=data, grid=grid)


def test_scale_to_pixel_projected():
    dem = _projected_dem(res=50.0)
    scales_pxl, res = geo.scale_to_pixel([500, 2000], dem)
    assert list(scales_pxl) == list(geo.round_up_to_odd(np.array([500, 2000]) / 50.0))
    assert res["x"].shape == (50,)
    assert res["y"].shape == (40,)
    np.testing.assert_allclose(np.abs(res["x"]), 50.0)
    np.testing.assert_allclose(np.abs(res["y"]), 50.0)


def test_scale_to_pixel_geographic():
    # ~30 m SRTM-like grid around Basodino (46.4N): 1 arcsec ~ 30.9 m in lat
    step = 1.0 / 3600.0
    y = 46.55 - np.arange(60) * step
    x = 8.2 + np.arange(80) * step
    grid = RasterGrid(y=y, x=x, crs="epsg:4326")
    dem = Raster(data=np.zeros((60, 80), np.float32), grid=grid)
    scales_pxl, res = geo.scale_to_pixel([500], dem)
    mean_res = np.mean(np.abs([res["x"].mean(), res["y"].mean()]))
    assert 20.0 < mean_res < 32.0  # lon shrinks by cos(46.4) ~ 0.69
    assert res["x"].shape == (60, 80)
    assert scales_pxl[0] % 2 == 1


def test_get_sigmas():
    sigmas = geo.get_sigmas([None, 0, 1, 0.5], np.array([8, 8, 8, 8]))
    assert sigmas[0] is None
    assert sigmas[1] is None
    assert sigmas[2] == pytest.approx(2.0)
    assert sigmas[3] == pytest.approx(1.0)


def test_fill_na_rows():
    dem = _projected_dem(ny=4, nx=6)
    data = dem.data.copy()
    data[:] = np.arange(6, dtype=np.float32)
    data[1, 2] = np.nan
    data[2, 0] = np.nan
    data[2, 5] = np.nan
    dem = dem.with_data(data)
    ind_nans, filled = fill_na(dem)
    assert len(ind_nans[0]) == 3
    assert not np.isnan(filled.data).any()
    # nearest neighbour in x: interior NaN takes an adjacent value
    assert filled.data[1, 2] in (1.0, 3.0)
    # edge NaNs extrapolate from the nearest valid value
    assert filled.data[2, 0] == 1.0
    assert filled.data[2, 5] == 4.0


def test_crop_sel():
    dem = _projected_dem(ny=10, nx=12, res=100.0)
    # y runs descending 900..0, x ascending 0..1100
    cropped = dem.crop({"x": slice(200, 600), "y": slice(700, 300)})
    assert cropped.grid.x[0] == 200 and cropped.grid.x[-1] == 600
    assert cropped.grid.y[0] == 700 and cropped.grid.y[-1] == 300
    assert cropped.data.shape == (5, 5)
