"""Directional derivatives, slope and aspect."""

from __future__ import annotations

from typing import Dict, List, Union

import jax
import jax.numpy as jnp
import numpy as np

from topo_descriptors_tpu.kernels.sobel import sobel_kernel
from topo_descriptors_tpu.ops.conv import (
    convolve_reflect,
    gaussian_filter,
    gradient_axis,
)


def sobel(dem: jax.Array):
    """3x3 Sobel derivatives (normalized by 8, 'reflect' boundary).

    Parity target: reference ``sobel`` (topo.py:658-685) via
    ``ndimage.convolve`` with the kernel and its transpose.
    """
    k = sobel_kernel()
    dx = convolve_reflect(dem, k)
    dy = convolve_reflect(dem, k.T)
    return dx, dy


def gradient(
    dem: jax.Array,
    sigma: float,
    res_meters: Dict[str, np.ndarray],
    sig_ratio: float = 1.0,
) -> List[jax.Array]:
    """W-E/S-N derivatives, slope (deg) and aspect (deg, N=0, E=90).

    Parity target: reference ``gradient`` (topo.py:597-644):

    * sigma <= 1: Sobel filter (the path is selected by *sigma*, not scale —
      reference topo.py:628);
    * sig_ratio == 1: ``np.gradient`` of the Gaussian-smoothed DEM
      (one-sided differences at the grid edges);
    * else: two anisotropic Gaussian passes, each differentiated along its
      own axis (reference topo.py:633-635);
    * derivatives normalized per-pixel by the metric resolution
      (reference ``_normalize_dxy``, topo.py:688-712);
    * ``slope = atan(|grad|)`` in degrees, ``aspect = (180 +
      atan2(dx, dy)) % 360``.
    """
    if sigma <= 1:
        dx, dy = sobel(dem)
    elif sig_ratio == 1:
        smooth = gaussian_filter(dem, sigma)
        dy = gradient_axis(smooth, 0)
        dx = gradient_axis(smooth, 1)
    else:
        sigma_perp = sigma * sig_ratio
        dx = gradient_axis(gaussian_filter(dem, (sigma_perp, sigma)), 1)
        dy = gradient_axis(gaussian_filter(dem, (sigma, sigma_perp)), 0)

    x_res = jnp.asarray(res_meters["x"], dtype=dem.dtype)
    y_res = jnp.asarray(res_meters["y"], dtype=dem.dtype)
    if y_res.ndim == 1:
        y_res = y_res[:, None]
    dx = dx / x_res
    dy = dy / y_res

    rad2deg = jnp.asarray(180.0 / np.pi, dtype=dem.dtype)
    slope = jnp.arctan(jnp.sqrt(dx * dx + dy * dy)) * rad2deg
    aspect = (180.0 + jnp.degrees(jnp.arctan2(dx, dy))) % 360.0
    return [dx, dy, slope, aspect]
