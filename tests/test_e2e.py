"""One-sweep end-to-end acceptance gate.

Runs the full descriptor battery on a Basodino-like WGS84 grid through the
real user flow — NetCDF ingest, low-elevation masking, NaN fill, every
``compute_*`` driver with a label-based crop — then reads every written file
back and asserts it against the reference recipe (scipy/numpy oracles from
test_ops) within float32 tolerance.  This is the executable-README analogue
the reference uses as its de-facto integration test
(/root/reference/README.md:143-190) that the per-op unit suite doesn't cover
in one sweep: ingest -> geometry -> compute -> NaN reassignment -> crop ->
file contract, all chained.
"""

import numpy as np
import pytest
import oracles as orc  # shared scipy oracles (tests/oracles.py)

from topo_descriptors_tpu import geo, pipeline
from topo_descriptors_tpu.config import CFG
from topo_descriptors_tpu.grid import fill_na
from topo_descriptors_tpu.io import (
    basodino_like_dem,
    get_dem_netcdf,
    read_raster,
    write_raster,
)
from topo_descriptors_tpu.kernels.sx_geometry import sx_offsets

SCALE = 300.0  # meters
SX_RADIUS = 300.0
SX_AZIMUTH = 270.0
FLATS = [0, 0.2]


@pytest.fixture(scope="module")
def battery(tmp_path_factory):
    """Ingest a synthetic WGS84 DEM with nodata holes and run every driver."""
    outdir = tmp_path_factory.mktemp("e2e")

    # WGS84 grid: exercises the UTM-meshgrid resolution path
    # (reference helpers.py:91-97) end to end, not just in test_geo
    raw = basodino_like_dem(ny=60, nx=80, projected=False)
    data = raw.data.copy()
    data[12:15, 20:24] = -400.0  # below CFG.min_elevation -> masked at ingest
    data[40, 0] = -9999.0  # nodata at a row edge -> extrapolated fill
    dem_path = outdir / "dem_in.nc"
    write_raster(raw.with_data(data), dem_path)

    dem = get_dem_netcdf(dem_path)  # masks <= min_elevation to NaN
    assert np.isnan(dem.data).sum() == 13
    ind_nans, dem_filled = fill_na(dem)

    # label-based crop strictly inside the grid (y is descending)
    crop = {
        "y": slice(float(raw.grid.y[4]), float(raw.grid.y[52])),
        "x": slice(float(raw.grid.x[6]), float(raw.grid.x[70])),
    }

    common = dict(ind_nans=ind_nans, crop=crop, outdir=outdir)
    files = {}
    files["dem"] = pipeline.compute_dem(dem_filled, [SCALE], **common)
    files["tpi"] = pipeline.compute_tpi(dem_filled, [SCALE], **common)
    files["std"] = pipeline.compute_std(dem_filled, [SCALE], **common)
    files["grad"] = pipeline.compute_gradient(
        dem_filled, [SCALE], sig_ratios=1, **common
    )
    files["valley"] = pipeline.compute_valley_ridge(
        dem_filled, [SCALE], "valley", flat_list=FLATS, **common
    )
    files["ridge"] = pipeline.compute_valley_ridge(
        dem_filled, [SCALE], "ridge", flat_list=FLATS, **common
    )
    files["sx"] = pipeline.compute_sx(
        dem_filled, SX_AZIMUTH, SX_RADIUS, crop=crop, outdir=outdir
    )
    return dict(
        outdir=outdir,
        dem=dem,
        filled=np.asarray(dem_filled.data, np.float32),
        ind_nans=ind_nans,
        crop_idx=dem.grid.sel(crop)[1],
        crop_grid=dem.grid.sel(crop)[0],
        files=files,
    )


def _finish(oracle, b, reassign_nans=True):
    """Driver epilogue on an oracle field: reassign NaNs, crop by labels.

    ``compute_sx`` is the one driver without the NaN-reassignment step
    (reference compute_sx topo.py:715-772 takes no ind_nans).
    """
    out = np.array(oracle, np.float32)
    if reassign_nans:
        out[b["ind_nans"]] = np.nan
    ys, xs = b["crop_idx"]
    return out[ys, xs]


def _check(path, b, expected_name, units, oracle, rtol=1e-4, atol=2e-2,
           reassign_nans=True):
    assert path.name == f"topo_{expected_name}.nc"
    r = read_raster(path)
    assert r.name == expected_name
    assert r.units == units
    np.testing.assert_allclose(r.grid.y, b["crop_grid"].y)
    np.testing.assert_allclose(r.grid.x, b["crop_grid"].x)
    # NaN protocol: exactly the ingest holes inside the crop window are NaN
    ref = _finish(oracle, b, reassign_nans)
    np.testing.assert_array_equal(np.isnan(r.data), np.isnan(ref))
    np.testing.assert_allclose(r.data, ref, rtol=rtol, atol=atol)
    return r


def _scale_pxl(b, scale=SCALE):
    scales_pxl, res = geo.scale_to_pixel([scale], b["dem"])
    return int(scales_pxl[0]), res


def test_e2e_dem(battery):
    from scipy import ndimage

    size, _ = _scale_pxl(battery)
    oracle = ndimage.gaussian_filter(battery["filled"], size / CFG.scale_std)
    _check(battery["files"]["dem"][0], battery, f"DEM_{SCALE}M", "m", oracle)


def test_e2e_tpi(battery):
    size, _ = _scale_pxl(battery)
    oracle = orc._tpi_oracle(battery["filled"], size)
    _check(battery["files"]["tpi"][0], battery, f"TPI_{SCALE}M", "m", oracle)


def test_e2e_std(battery):
    size, _ = _scale_pxl(battery)
    oracle = orc._std_oracle(battery["filled"], size, exact=True)
    _check(
        battery["files"]["std"][0], battery, f"STD_{SCALE}M", "m", oracle,
        rtol=2e-3, atol=5e-1,
    )


def test_e2e_gradient(battery):
    size, res = _scale_pxl(battery)
    oracles = orc._gradient_oracle(
        battery["filled"], size / CFG.scale_std, res, sig_ratio=1
    )
    names = [
        f"WE_DERIVATIVE_{SCALE}M_SIGRATIO1",
        f"SN_DERIVATIVE_{SCALE}M_SIGRATIO1",
        f"SLOPE_{SCALE}M_SIGRATIO1",
        f"ASPECT_{SCALE}M_SIGRATIO1",
    ]
    units = ["1", "1", "degree", "degree"]
    for path, name, unit, oracle in zip(
        battery["files"]["grad"], names, units, oracles
    ):
        # aspect wraps mod 360: a tiny dx/dy jitter near North flips
        # 0<->360, so compare angles on the circle
        if name.startswith("ASPECT"):
            r = read_raster(path)
            assert r.name == name and r.units == unit
            ref = _finish(oracle, battery)
            diff = np.abs(r.data - ref)
            diff = np.minimum(diff, 360 - diff)
            assert np.nanmax(diff) < 0.1
        else:
            _check(path, battery, name, unit, oracle, rtol=1e-3, atol=5e-3)


@pytest.mark.parametrize("mode", ["valley", "ridge"])
def test_e2e_valley_ridge(battery, mode):
    size, _ = _scale_pxl(battery)
    oracles = orc._valley_ridge_oracle(battery["filled"], size, mode, FLATS)
    upper = mode.upper()
    norm = _check(
        battery["files"][mode][0], battery, f"{upper}_NORM_{SCALE}M", "1",
        oracles[0], rtol=1e-3, atol=5e-3,
    )
    # direction: ties between adjacent angles may fall either way — bound the
    # mismatch fraction instead (same criterion as the unit suite)
    path = battery["files"][mode][1]
    assert path.name == f"topo_{upper}_DIR_{SCALE}M.nc"
    r = read_raster(path)
    assert r.units == "1"
    ref = _finish(oracles[1], battery)
    both = ~(np.isnan(r.data) | np.isnan(ref))
    assert (r.data[both] != ref[both]).mean() < 0.02
    assert norm is not None


def test_e2e_sx(battery):
    _, res = _scale_pxl(battery, SX_RADIUS)
    dx = float(res["x"].mean())
    dy = float(res["y"].mean())
    offsets, distances, border = sx_offsets(SX_AZIMUTH, SX_RADIUS, dx, dy)
    oracle = orc._sx_oracle(
        battery["filled"], offsets, distances, border, height=10.0
    )
    _check(
        battery["files"]["sx"][0], battery,
        f"SX_RADIUS{int(SX_RADIUS)}_AZIMUTH{int(SX_AZIMUTH)}", "degree",
        oracle, rtol=1e-4, atol=1e-3, reassign_nans=False,
    )


def test_e2e_full_inventory(battery):
    """Every descriptor of the battery landed on disk, no extras."""
    written = {p.name for paths in battery["files"].values() for p in paths}
    assert len(written) == 12  # 1+1+1+4+2+2+1
    on_disk = {p.name for p in battery["outdir"].glob("topo_*.nc")}
    assert written == on_disk
