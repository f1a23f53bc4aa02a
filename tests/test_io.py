"""Round-5 I/O contract tests (atomic band-writer completion)."""

import numpy as np


def test_band_writer_atomic_completion(tmp_path):
    """A crashed band write must not leave a final-named file that
    --skip-existing would trust (round-5 checkpoint/resume soundness)."""
    from topo_descriptors_tpu.grid import RasterGrid
    from topo_descriptors_tpu.io.netcdf import RasterBandWriter, read_raster

    grid = RasterGrid(y=np.arange(8.0)[::-1], x=np.arange(6.0),
                      crs="epsg:2056")
    path = tmp_path / "topo_X.nc"
    w = RasterBandWriter(path, grid, "X")
    w.write_rows(0, np.ones((4, 6), np.float32))
    assert not path.exists()  # mid-write: only the .partial file exists
    # simulated crash: the partial is discarded, final name never appears
    w.abort()
    assert not path.exists()
    assert not (tmp_path / "topo_X.nc.partial").exists()
    # a successful close renames onto the final path
    with RasterBandWriter(path, grid, "X") as w2:
        w2.write_rows(0, np.zeros((8, 6), np.float32))
    assert path.exists()
    assert read_raster(path).data.shape == (8, 6)
