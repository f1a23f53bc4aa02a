"""GeoTIFF I/O: round-trip, compression, endianness, georeferencing."""

import numpy as np
import pytest

from topo_descriptors_tpu.io import basodino_like_dem
from topo_descriptors_tpu.io.geotiff import (
    GeoTiffWindowReader,
    read_geotiff,
    write_geotiff,
)


@pytest.fixture()
def dem():
    return basodino_like_dem(ny=40, nx=56, projected=True)


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip(tmp_path, dem, compress):
    path = tmp_path / "dem.tif"
    write_geotiff(dem, path, compress=compress)
    back = read_geotiff(path)
    np.testing.assert_allclose(back.data, dem.data, rtol=1e-7)
    np.testing.assert_allclose(back.grid.x, dem.grid.x, rtol=1e-12)
    np.testing.assert_allclose(back.grid.y, dem.grid.y, rtol=1e-12)
    assert back.grid.crs == "epsg:32632"


def test_geographic_crs_roundtrip(tmp_path):
    dem = basodino_like_dem(ny=24, nx=36, projected=False)
    path = tmp_path / "dem.tif"
    write_geotiff(dem, path)
    back = read_geotiff(path)
    assert back.grid.crs == "epsg:4326"
    np.testing.assert_allclose(back.grid.x, dem.grid.x, rtol=1e-9)


def test_reader_handles_int16_bigendian_strips(tmp_path):
    # hand-build a big-endian, multi-strip, uncompressed int16 TIFF
    import struct

    h, w, rps = 7, 5, 3
    data = (np.arange(h * w) * 3 - 20).astype(">i2").reshape(h, w)
    strips = [data[r : r + rps].tobytes() for r in range(0, h, rps)]

    bo = ">"
    n_entries = 9
    ifd_offset = 8
    ifd_size = 2 + n_entries * 12 + 4
    extra_off = ifd_offset + ifd_size
    n_strips = len(strips)
    # out-of-line arrays: strip offsets + counts (I * n each)
    strip_counts = [len(s) for s in strips]
    data_start = extra_off + 8 * n_strips
    strip_offsets = []
    pos = data_start
    for c in strip_counts:
        strip_offsets.append(pos)
        pos += c

    def entry(tag, typ, cnt, value):
        return struct.pack(bo + "HHI", tag, typ, cnt) + value

    def inline_short(v):
        return struct.pack(bo + "H", v) + b"\0\0"

    def inline_long(v):
        return struct.pack(bo + "I", v)

    entries = [
        entry(256, 4, 1, inline_long(w)),
        entry(257, 4, 1, inline_long(h)),
        entry(258, 3, 1, inline_short(16)),
        entry(259, 3, 1, inline_short(1)),
        entry(262, 3, 1, inline_short(1)),
        entry(273, 4, n_strips, inline_long(extra_off)),
        entry(278, 4, 1, inline_long(rps)),
        entry(279, 4, n_strips, inline_long(extra_off + 4 * n_strips)),
        entry(339, 3, 1, inline_short(2)),
    ]
    out = struct.pack(bo + "2sHI", b"MM", 42, 8)
    out += struct.pack(bo + "H", n_entries) + b"".join(entries)
    out += struct.pack(bo + "I", 0)
    out += struct.pack(bo + "I" * n_strips, *strip_offsets)
    out += struct.pack(bo + "I" * n_strips, *strip_counts)
    out += b"".join(strips)

    path = tmp_path / "hand.tif"
    path.write_bytes(out)
    back = read_geotiff(path)
    np.testing.assert_array_equal(back.data, data.astype("=i2"))


def test_reader_rejects_garbage(tmp_path):
    path = tmp_path / "not.tif"
    path.write_bytes(b"hello world, definitely not a tiff")
    with pytest.raises(ValueError):
        read_geotiff(path)


def test_writer_rejects_nonuniform_grid(tmp_path, dem):
    from topo_descriptors_tpu.grid import Raster, RasterGrid

    grid = RasterGrid(
        y=dem.grid.y, x=np.cumsum(np.random.rand(dem.data.shape[1]) + 1),
        crs="epsg:32632",
    )
    bad = Raster(data=dem.data, grid=grid)
    with pytest.raises(ValueError):
        write_geotiff(bad, tmp_path / "bad.tif")


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize(
    "layout", [{"rows_per_strip": 7}, {"tile": (16, 32)}]
)
def test_chunked_layout_roundtrip(tmp_path, dem, layout, compress):
    path = tmp_path / "dem.tif"
    write_geotiff(dem, path, compress=compress, **layout)
    back = read_geotiff(path)
    np.testing.assert_allclose(back.data, dem.data, rtol=1e-7)
    np.testing.assert_allclose(back.grid.x, dem.grid.x, rtol=1e-12)
    np.testing.assert_allclose(back.grid.y, dem.grid.y, rtol=1e-12)


@pytest.mark.parametrize(
    "layout", [{"rows_per_strip": 7}, {"tile": (16, 16)}]
)
def test_windowed_reads_match_full(tmp_path, dem, layout):
    path = tmp_path / "dem.tif"
    write_geotiff(dem, path, **layout)
    full = read_geotiff(path).data
    with GeoTiffWindowReader(path) as reader:
        assert reader.shape == dem.data.shape
        # assorted interior/edge/degenerate windows
        for r0, r1, c0, c1 in [
            (0, 5, 0, 56), (3, 19, 4, 31), (35, 40, 40, 56),
            (12, 13, 0, 1), (0, 40, 0, 56), (7, 7, 3, 9),
        ]:
            win = reader.read_rows(r0, r1, c0, c1)
            np.testing.assert_array_equal(win, full[r0:r1, c0:c1])
        # slicing protocol delegates to read_rows
        np.testing.assert_array_equal(reader[3:19, 4:31], full[3:19, 4:31])
        np.testing.assert_array_equal(reader[5:9], full[5:9])


def test_windowed_read_decodes_only_intersecting_chunks(tmp_path, dem):
    path = tmp_path / "dem.tif"
    write_geotiff(dem, path, rows_per_strip=8)  # 40 rows -> 5 strips
    with GeoTiffWindowReader(path) as reader:
        reader.read_rows(9, 15)  # rows 9..14 live entirely in strip 1
        assert reader.chunks_decoded == 1
        reader.read_rows(0, 17)  # strips 0..2
        assert reader.chunks_decoded == 1 + 3

    path2 = tmp_path / "dem_tiled.tif"
    write_geotiff(dem, path2, tile=(16, 16))  # 40x56 -> 3x4 tiles
    with GeoTiffWindowReader(path2) as reader:
        reader.read_rows(0, 10, 0, 10)  # one corner tile
        assert reader.chunks_decoded == 1
        reader.read_rows(10, 20, 10, 20)  # 2x2 tile neighborhood
        assert reader.chunks_decoded == 1 + 4


def test_window_reader_rejects_out_of_bounds(tmp_path, dem):
    path = tmp_path / "dem.tif"
    write_geotiff(dem, path, rows_per_strip=8)
    with GeoTiffWindowReader(path) as reader:
        with pytest.raises(ValueError):
            reader.read_rows(0, 41)
        with pytest.raises(ValueError):
            reader.read_rows(-1, 5)
        with pytest.raises(ValueError):
            reader.read_rows(0, 5, 0, 57)


def test_writer_rejects_bad_tile_dims(tmp_path, dem):
    with pytest.raises(ValueError):
        write_geotiff(dem, tmp_path / "bad.tif", tile=(15, 16))
