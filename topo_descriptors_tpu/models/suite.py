"""TerrainSuite — the flagship fused descriptor model.

The reference computes descriptors one at a time, each a separate host
round-trip (scripts/compute_topo_descriptors.py:40-91 runs 7 sequential
``compute_*`` calls). TerrainSuite compiles a whole descriptor battery into
ONE jit program: XLA sees every op at once, shares the DEM load, fuses the
elementwise tails, and overlaps independent convolutions. This is the
"forward step" of the framework — the unit the driver compile-checks and the
multi-chip dry-run shards.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from topo_descriptors_tpu import ops
from topo_descriptors_tpu.kernels.sx_geometry import sx_offsets


@dataclasses.dataclass(frozen=True)
class SuiteConfig:
    """Static configuration of a TerrainSuite program.

    Scales are in pixels (odd, via geo.scale_to_pixel); resolutions in
    meters/pixel. Any section can be disabled with an empty tuple / None.
    """

    tpi_scales_pxl: Tuple[int, ...] = (9, 33)
    std_scales_pxl: Tuple[int, ...] = (9,)
    gradient_sigmas: Tuple[float, ...] = (2.25,)
    sig_ratios: Tuple[float, ...] = (1.0,)
    valley_size_pxl: Optional[int] = 9
    valley_flats: Tuple[float, ...] = (0, 0.15, 0.3)
    sx_azimuth: Optional[float] = 0.0
    sx_radius_m: float = 500.0
    res_x_m: float = 30.0
    res_y_m: float = -30.0


class TerrainSuite:
    """One fused forward program over a fixed grid shape."""

    def __init__(self, shape: Tuple[int, int], config: SuiteConfig = SuiteConfig()):
        self.shape = shape
        self.config = config
        cfg = config
        self._res = {
            "x": np.full(shape[1], cfg.res_x_m, dtype=np.float32),
            "y": np.full(shape[0], cfg.res_y_m, dtype=np.float32),
        }
        if cfg.sx_azimuth is not None:
            self._sx_geom = sx_offsets(
                cfg.sx_azimuth,
                cfg.sx_radius_m,
                abs(cfg.res_x_m),
                abs(cfg.res_y_m),
            )
        else:
            self._sx_geom = None

    def forward(self, dem: jax.Array) -> Dict[str, jax.Array]:
        """The jittable forward step: DEM -> named descriptor stack."""
        cfg = self.config
        out: Dict[str, jax.Array] = {}
        for size in cfg.tpi_scales_pxl:
            out[f"tpi_{size}px"] = ops.tpi(dem, size)
        for size in cfg.std_scales_pxl:
            out[f"std_{size}px"] = ops.std(dem, size)
        for sigma, ratio in zip(cfg.gradient_sigmas, cfg.sig_ratios):
            dx, dy, slope, aspect = ops.gradient(dem, sigma, self._res, ratio)
            out[f"dx_s{sigma:g}"] = dx
            out[f"dy_s{sigma:g}"] = dy
            out[f"slope_s{sigma:g}"] = slope
            out[f"aspect_s{sigma:g}"] = aspect
        if cfg.valley_size_pxl:
            norm, direction = ops.valley_ridge(
                dem, cfg.valley_size_pxl, "valley", list(cfg.valley_flats)
            )
            out["valley_norm"] = norm
            out["valley_dir"] = direction
        if self._sx_geom is not None:
            offsets, distances, border = self._sx_geom
            out["sx"] = ops.sx(dem, offsets, distances, border)
        return out

    def jit(self):
        return jax.jit(self.forward)
