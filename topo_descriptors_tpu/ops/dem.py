"""Smoothed-DEM descriptor."""

from __future__ import annotations

import jax

from topo_descriptors_tpu.ops.conv import gaussian_filter


def dem(dem_array: jax.Array, sigma: float) -> jax.Array:
    """Gaussian-smoothed DEM at standard deviation ``sigma`` (pixels).

    Parity target: reference ``dem`` (topo.py:62-80), i.e.
    ``scipy.ndimage.gaussian_filter(dem, sigma)``.
    """
    if not sigma:
        return dem_array
    return gaussian_filter(dem_array, sigma)
