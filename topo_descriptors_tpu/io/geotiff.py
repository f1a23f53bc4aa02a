"""Minimal self-contained GeoTIFF I/O (pure Python + zlib).

The reference ingests DEMs through xarray/rasterio; neither ships in this
image, and the benchmark DEM (`Basodino-30m-DEM.tif`, BASELINE.md) is a
GeoTIFF — so the framework speaks the format directly. Supported subset
(which covers SRTM/USGS-style elevation rasters):

* classic TIFF (little/big endian), single-band grayscale
* strip or tile organization
* uncompressed or Deflate/AdobeDeflate compression, horizontal-differencing
  predictor
* uint8/16/32, int8/16/32, float32/64 samples
* georeferencing via ModelPixelScale + ModelTiepoint and the GeoKey
  directory's EPSG code (geographic 2048 / projected 3072 keys)

Coordinates follow the pixel-centre convention (tie point = upper-left
corner of pixel (0,0), i.e. RasterPixelIsArea), matching what
xarray/rioxarray hand to the reference.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from topo_descriptors_tpu.grid import Raster, RasterGrid

# TIFF tag ids
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFFSETS, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 278, 279
_SAMPLE_FORMAT = 339
_TILE_W, _TILE_H, _TILE_OFFSETS, _TILE_COUNTS = 322, 323, 324, 325
_PREDICTOR = 317
_SAMPLES_PER_PIXEL = 277
_PIXEL_SCALE, _TIEPOINT, _GEO_KEYS = 33550, 33922, 34735

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd(data: bytes, bo: str, offset: int) -> Dict[int, tuple]:
    n_entries = struct.unpack_from(bo + "H", data, offset)[0]
    tags = {}
    for i in range(n_entries):
        base = offset + 2 + i * 12
        tag, typ, count = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            value_bytes = data[base + 8 : base + 8 + size]
        else:
            value_offset = struct.unpack_from(bo + "I", data, base + 8)[0]
            value_bytes = data[value_offset : value_offset + size]
        if typ in _TYPE_FMT:
            values = struct.unpack(bo + _TYPE_FMT[typ] * count, value_bytes)
        elif typ == 5:  # RATIONAL
            raw = struct.unpack(bo + "I" * (2 * count), value_bytes)
            values = tuple(raw[2 * i] / raw[2 * i + 1] for i in range(count))
        else:
            values = (value_bytes,)
        tags[tag] = values
    return tags


def _dtype_for(bits: int, sample_format: int, bo: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(sample_format, "u")
    return np.dtype(f"{'<' if bo == '<' else '>'}{kind}{bits // 8}")


def _epsg_from_geokeys(values: Tuple[int, ...]) -> str:
    # GeoKeyDirectory: header of 4 shorts then (key, loc, count, value) rows
    epsg = None
    for i in range(4, len(values) - 3, 4):
        key, loc, _count, value = values[i : i + 4]
        if key in (2048, 3072) and loc == 0:  # geographic / projected CRS
            epsg = value
            if key == 3072:  # projected takes precedence
                break
    return f"epsg:{epsg}" if epsg else "epsg:unknown"


def read_geotiff(path, name: str = "DEM") -> Raster:
    """Read a single-band GeoTIFF into a :class:`Raster`."""
    data = Path(path).read_bytes()
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    magic, ifd_offset = struct.unpack_from(bo + "HI", data, 2)
    if magic == 43:
        raise ValueError("BigTIFF is not supported (classic TIFF only)")
    if magic != 42:
        raise ValueError("not a TIFF file")
    tags = _read_ifd(data, bo, ifd_offset)

    width = tags[_W][0]
    height = tags[_H][0]
    bits = tags.get(_BITS, (32,))[0]
    comp = tags.get(_COMP, (1,))[0]
    fmt = tags.get(_SAMPLE_FORMAT, (1,))[0]
    predictor = tags.get(_PREDICTOR, (1,))[0]
    spp = tags.get(_SAMPLES_PER_PIXEL, (1,))[0]
    if spp != 1:
        raise ValueError(f"only single-band rasters supported, got {spp} bands")
    if comp not in (1, 8, 32946):
        raise ValueError(f"unsupported compression {comp} (none/deflate only)")
    dtype = _dtype_for(bits, fmt, bo)

    def decode(chunk: bytes, rows: int, cols: int) -> np.ndarray:
        if comp in (8, 32946):
            chunk = zlib.decompress(chunk)
        arr = np.frombuffer(chunk, dtype=dtype, count=rows * cols)
        arr = arr.reshape(rows, cols)
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.int64), axis=1).astype(dtype)
        return arr

    image = np.zeros((height, width), dtype=dtype)
    if _TILE_OFFSETS in tags:
        tw, th = tags[_TILE_W][0], tags[_TILE_H][0]
        offsets = tags[_TILE_OFFSETS]
        counts = tags[_TILE_COUNTS]
        tiles_across = -(-width // tw)
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            ty, tx = divmod(idx, tiles_across)
            tile = decode(data[off : off + cnt], th, tw)
            y0, x0 = ty * th, tx * tw
            image[y0 : y0 + th, x0 : x0 + tw] = tile[
                : height - y0, : width - x0
            ]
    else:
        rps = tags.get(_ROWS_PER_STRIP, (height,))[0]
        offsets = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_COUNTS]
        row = 0
        for off, cnt in zip(offsets, counts):
            rows = min(rps, height - row)
            image[row : row + rows] = decode(data[off : off + cnt], rows, width)
            row += rows

    # georeferencing
    scale = tags.get(_PIXEL_SCALE, (1.0, 1.0, 0.0))
    tie = tags.get(_TIEPOINT, (0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    sx, sy = float(scale[0]), float(scale[1])
    x0, y0 = float(tie[3]), float(tie[4])
    x_coords = x0 + (np.arange(width) + 0.5) * sx
    y_coords = y0 - (np.arange(height) + 0.5) * sy
    crs = "epsg:unknown"
    if _GEO_KEYS in tags:
        crs = _epsg_from_geokeys(tags[_GEO_KEYS])

    grid = RasterGrid(y=y_coords, x=x_coords, crs=crs)
    return Raster(
        data=image.astype(image.dtype.newbyteorder("=")),
        grid=grid,
        name=name,
        units="m",
    )


def write_geotiff(raster: Raster, path, compress: bool = True) -> None:
    """Write a single-band float32 GeoTIFF (deflate strips, EPSG geokeys).

    Requires a uniformly spaced grid (GeoTIFF's affine model); coordinates
    are written back from the pixel-centre convention.
    """
    data = np.asarray(raster.data, dtype=np.float32)
    h, w = data.shape
    x, y = np.asarray(raster.grid.x, np.float64), np.asarray(
        raster.grid.y, np.float64
    )
    sx = float(x[1] - x[0]) if w > 1 else 1.0
    sy = float(y[0] - y[1]) if h > 1 else 1.0
    if w > 2 and not np.allclose(np.diff(x), sx, rtol=1e-6):
        raise ValueError("GeoTIFF requires uniform x spacing")
    if h > 2 and not np.allclose(-np.diff(y), sy, rtol=1e-6):
        raise ValueError("GeoTIFF requires uniform y spacing")
    x0 = float(x[0]) - 0.5 * sx
    y0 = float(y[0]) + 0.5 * sy
    epsg = 0
    crs = raster.grid.crs.lower()
    if "epsg:" in crs:
        tail = crs.split("epsg:")[1]
        if tail.isdigit():
            epsg = int(tail)
    is_geographic = epsg == 4326

    payload = data.tobytes()
    if compress:
        payload = zlib.compress(payload, 6)

    bo = "<"
    header = struct.pack(bo + "2sHI", b"II", 42, 8)

    # values larger than 4 bytes live after the IFD; lay out: header, IFD,
    # out-of-line values, strip data
    entries = []

    def entry(tag, typ, values, fmt):
        entries.append((tag, typ, values, fmt))

    geo_keys = [1, 1, 0, 2,  # version, rev, minor, number of keys
                1024, 0, 1, 2 if is_geographic else 1,  # model type
                2048 if is_geographic else 3072, 0, 1, epsg]
    entry(_W, 4, (w,), "I")
    entry(_H, 4, (h,), "I")
    entry(_BITS, 3, (32,), "H")
    entry(_COMP, 3, (8 if compress else 1,), "H")
    entry(_PHOTO, 3, (1,), "H")
    entry(_STRIP_OFFSETS, 4, (0,), "I")  # patched below
    entry(_SAMPLES_PER_PIXEL, 3, (1,), "H")
    entry(_ROWS_PER_STRIP, 4, (h,), "I")
    entry(_STRIP_COUNTS, 4, (len(payload),), "I")
    entry(_SAMPLE_FORMAT, 3, (3,), "H")
    entry(_PIXEL_SCALE, 12, (sx, sy, 0.0), "d")
    entry(_TIEPOINT, 12, (0.0, 0.0, 0.0, x0, y0, 0.0), "d")
    entry(_GEO_KEYS, 3, tuple(geo_keys), "H")

    entries.sort(key=lambda e: e[0])
    ifd_offset = 8
    ifd_size = 2 + len(entries) * 12 + 4
    extra_offset = ifd_offset + ifd_size
    extra = b""
    packed = []
    strip_offset_pos = None
    for tag, typ, values, fmt in entries:
        raw = struct.pack(bo + fmt * len(values), *values)
        if len(raw) <= 4:
            value_field = raw.ljust(4, b"\0")
        else:
            value_field = struct.pack(bo + "I", extra_offset + len(extra))
            extra += raw
        packed.append((tag, typ, len(values), value_field))
        if tag == _STRIP_OFFSETS:
            strip_offset_pos = len(packed) - 1

    data_offset = extra_offset + len(extra)
    tag, typ, cnt, _ = packed[strip_offset_pos]
    packed[strip_offset_pos] = (tag, typ, cnt, struct.pack(bo + "I", data_offset))

    out = bytearray(header)
    out += struct.pack(bo + "H", len(packed))
    for tag, typ, cnt, value_field in packed:
        out += struct.pack(bo + "HHI", tag, typ, cnt) + value_field
    out += struct.pack(bo + "I", 0)  # next IFD
    out += extra
    out += payload
    Path(path).write_bytes(bytes(out))
