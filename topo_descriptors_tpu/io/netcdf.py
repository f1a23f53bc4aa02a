"""NetCDF4-compatible raster I/O via h5py.

NetCDF4 files are HDF5 files following the netCDF data model: coordinate
variables are HDF5 *dimension scales* attached to data variables. Writing
with those conventions makes the output interoperable with xarray/netCDF4
readers, mirroring the reference's output contract (helpers.py:34-65):
uppercase variable name, coords and attrs copied from the DEM, optional crop,
per-variable ``units`` attr, file name ``topo_<NAME>.nc``.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from topo_descriptors_tpu.config import CFG
from topo_descriptors_tpu.grid import Raster, RasterGrid

logger = logging.getLogger(__name__)

_RESERVED_ATTRS = ("DIMENSION_LIST", "CLASS", "NAME", "REFERENCE_LIST", "_Netcdf4Dimid")


def write_raster(raster: Raster, path) -> None:
    """Write one named 2-D variable with y/x coordinate scales (netCDF4 layout)."""
    import h5py

    path = Path(path)
    with h5py.File(path, "w") as f:
        for dim, vals in (("y", raster.grid.y), ("x", raster.grid.x)):
            d = f.create_dataset(dim, data=np.asarray(vals))
            d.make_scale(dim)
        v = f.create_dataset(raster.name, data=np.asarray(raster.data))
        v.dims[0].attach_scale(f["y"])
        v.dims[1].attach_scale(f["x"])
        if raster.units is not None:
            v.attrs["units"] = raster.units
        f.attrs["crs"] = raster.grid.crs
        for key, val in raster.attrs.items():
            if key not in ("crs",):
                try:
                    f.attrs[key] = val
                except TypeError:
                    f.attrs[key] = str(val)


def read_raster(path) -> Raster:
    """Read a single-variable NetCDF4/HDF5 raster written by this module or
    any netCDF4 writer following the same conventions."""
    import h5py

    path = Path(path)
    with h5py.File(path, "r") as f:
        coord_names = set()
        var_name = None
        for name, ds in f.items():
            if not isinstance(ds, h5py.Dataset):
                continue
            if ds.attrs.get("CLASS") == b"DIMENSION_SCALE":
                coord_names.add(name)
            elif ds.ndim >= 2:
                var_name = name
        if var_name is None:
            raise ValueError(f"no 2-D data variable found in {path}")
        v = f[var_name]
        data = np.asarray(v).squeeze()
        # coordinates: prefer attached dimension scales, else named y/x
        def coord_for(dim_idx, fallback):
            try:
                scales = v.dims[dim_idx]
                if len(scales):
                    return np.asarray(scales[0])
            except Exception:
                pass
            if fallback in f:
                return np.asarray(f[fallback])
            return np.arange(data.shape[dim_idx], dtype=np.float64)

        y = coord_for(0, "y")
        x = coord_for(1, "x")
        attrs = {}
        for key, val in f.attrs.items():
            if key in _RESERVED_ATTRS:
                continue
            attrs[key] = val.decode() if isinstance(val, bytes) else val
        crs = str(attrs.get("crs", ""))
        units = v.attrs.get("units")
        if isinstance(units, bytes):
            units = units.decode()
        grid = RasterGrid(y=y, x=x, crs=crs or "epsg:unknown")
        return Raster(
            data=data, grid=grid, name=var_name, units=units, attrs=attrs
        )


def get_dem_netcdf(path_dem) -> Raster:
    """Load a DEM and mask low elevations.

    Reference semantics (helpers.py:17-31): cast float32, squeeze, and set
    elevations <= CFG.min_elevation to NaN. GeoTIFF files (.tif/.tiff) are
    dispatched to the built-in GeoTIFF reader.
    """
    suffix = str(path_dem).lower()
    if suffix.endswith((".tif", ".tiff")):
        from topo_descriptors_tpu.io.geotiff import read_geotiff

        raster = read_geotiff(path_dem)
    else:
        raster = read_raster(path_dem)
    data = raster.data.astype(np.float32)
    data = np.where(data > CFG.min_elevation, data, np.nan)
    return raster.with_data(data)


def to_netcdf(
    array,
    dem: Raster,
    name: str,
    crop: Optional[Dict[str, slice]] = None,
    outdir=".",
    units: Optional[str] = None,
) -> Path:
    """Save one descriptor array next to the DEM's coords/attrs.

    Reference semantics (helpers.py:34-65): uppercase name, optional crop via
    label-based selection, ``units`` variable attr, file ``topo_<NAME>.nc``.
    Returns the written path.
    """
    name = str.upper(name)
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    out = Raster(
        data=np.asarray(array),
        grid=dem.grid,
        name=name,
        units=units,
        attrs=dict(dem.attrs) | {"crs": dem.grid.crs},
    ).crop(crop)
    filename = outdir / f"topo_{name}.nc"
    write_raster(out, filename)
    logger.info(f"saved: {filename}")
    return filename
