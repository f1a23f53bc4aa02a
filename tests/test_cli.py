"""CLI driver tests (CPU, synthetic DEM)."""

import numpy as np

from topo_descriptors_tpu.cli import main
from topo_descriptors_tpu.io import read_raster


def test_cli_synthetic_tpi_std(tmp_path):
    rc = main(
        [
            "--synthetic", "48x64",
            "--descriptors", "tpi", "std",
            "--scales", "300", "600",
            "--outdir", str(tmp_path),
        ]
    )
    assert rc == 0
    files = sorted(p.name for p in tmp_path.glob("topo_*.nc"))
    assert files == [
        "topo_STD_300M.nc",
        "topo_STD_600M.nc",
        "topo_TPI_300M.nc",
        "topo_TPI_600M.nc",
    ]


def test_cli_skip_existing(tmp_path):
    args = [
        "--synthetic", "48x64",
        "--descriptors", "tpi",
        "--scales", "300",
        "--outdir", str(tmp_path),
        "--skip-existing",
    ]
    assert main(args) == 0
    out = tmp_path / "topo_TPI_300M.nc"
    first_mtime = out.stat().st_mtime_ns
    assert main(args) == 0  # second run skips, file untouched
    assert out.stat().st_mtime_ns == first_mtime


def test_cli_sharded_runs(tmp_path):
    rc = main(
        [
            "--synthetic", "64x64",
            "--descriptors", "tpi", "sx",
            "--scales", "300",
            "--sx-azimuths", "0", "180",
            "--sx-radius", "200",
            "--outdir", str(tmp_path),
            "--sharded", "--mesh", "2", "4",
        ]
    )
    assert rc == 0
    sx0 = read_raster(tmp_path / "topo_SX_RADIUS200_AZIMUTH0.nc")
    assert np.isfinite(sx0.data).all()


def test_cli_tiled_runs(tmp_path):
    rc = main(
        [
            "--synthetic", "64x64",
            "--descriptors", "tpi",
            "--scales", "300",
            "--outdir", str(tmp_path),
            "--tiled", "16",
        ]
    )
    assert rc == 0
    assert (tmp_path / "topo_TPI_300M.nc").exists()


def test_cli_sharded_and_tiled_conflict(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(["--synthetic", "32x32", "--sharded", "--tiled", "8",
              "--outdir", str(tmp_path)])


def test_cli_stream_runs(tmp_path):
    from topo_descriptors_tpu.io import basodino_like_dem, write_raster

    dem_path = tmp_path / "dem.nc"
    write_raster(basodino_like_dem(ny=64, nx=64, projected=True), dem_path)
    rc = main(
        [
            "--dem", str(dem_path),
            "--descriptors", "tpi", "gradient", "sx",
            "--scales", "300",
            "--sx-azimuths", "0", "180",
            "--sx-radius", "200",
            "--outdir", str(tmp_path),
            "--stream", "16",
        ]
    )
    assert rc == 0
    assert (tmp_path / "topo_TPI_300M.nc").exists()
    assert (tmp_path / "topo_SLOPE_300M_SIGRATIO1.nc").exists()
    sx0 = read_raster(tmp_path / "topo_SX_RADIUS200_AZIMUTH0.nc")
    assert np.isfinite(sx0.data).all()


def test_cli_stream_sharded_runs(tmp_path):
    """--stream --sharded: windowed ingest straight onto the device mesh,
    shard_map descriptors, banded NetCDF output (round-4 composition —
    BASELINE configs[4]'s full-Alps shape on the 8-virtual-device mesh)."""
    from topo_descriptors_tpu.io import basodino_like_dem, write_raster

    dem_path = tmp_path / "dem.nc"
    write_raster(basodino_like_dem(ny=64, nx=64, projected=True), dem_path)
    rc = main(
        [
            "--dem", str(dem_path),
            "--descriptors", "dem", "tpi", "std", "gradient", "valley", "sx",
            "--scales", "300",
            "--sx-azimuths", "0", "180",
            "--sx-radius", "200",
            "--outdir", str(tmp_path),
            "--stream", "16",
            "--sharded", "--mesh", "2", "4",
        ]
    )
    assert rc == 0
    for name in (
        "topo_DEM_300M.nc", "topo_TPI_300M.nc", "topo_STD_300M.nc",
        "topo_SLOPE_300M_SIGRATIO1.nc", "topo_VALLEY_NORM_300M.nc",
        "topo_SX_RADIUS200_AZIMUTH0.nc",
    ):
        assert (tmp_path / name).exists(), name
    tpi = read_raster(tmp_path / "topo_TPI_300M.nc")
    assert tpi.data.shape == (64, 64)
    assert np.isfinite(tpi.data).any()


def test_cli_stream_requires_dem(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(["--synthetic", "32x32", "--stream", "8",
              "--outdir", str(tmp_path)])
