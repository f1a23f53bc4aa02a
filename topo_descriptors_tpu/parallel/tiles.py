"""Out-of-core tiled execution: stream grids larger than device memory
through one chip in halo-overlapped row bands.

This is the TPU-native replacement for the reference's dask ``map_overlap``
path (topo.py:177-178, its only out-of-core story, reachable only from tpi
and only with a dask-backed array). Here every descriptor op runs banded:

* the host array is cut into row bands of ``tile_rows``;
* each band is shipped to the device with a halo of the op's influence
  radius (kernel 'same' anchor, Gaussian tap radius + 1 for np.gradient,
  Sx ray border, rotated-kernel half-extent);
* the op runs on the (band + halo) window with its normal boundary
  handling — the window's synthetic edges only pollute outputs inside the
  halo, which are cropped, while true global edges coincide with window
  edges and keep exact single-pass semantics;
* global statistics (TPI/STD centring, valley/ridge standardization) are
  computed host-side in float64 over the full array first, so every band
  sees identical constants.

Results are bit-comparable to the single-pass ops (same device math, same
boundary data) for any tile size >= 1 halo.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from topo_descriptors_tpu import ops
from topo_descriptors_tpu.kernels.gaussian import gaussian_radius
from topo_descriptors_tpu.kernels.valley import rotated_kernel_bank
from topo_descriptors_tpu.ops.valley_ridge import prepare_valley_bank

logger = logging.getLogger(__name__)


class TiledRunner:
    """Banded out-of-core execution of descriptor ops on one device."""

    def __init__(self, tile_rows: int = 4096):
        self.tile_rows = int(tile_rows)

    # -- banding machinery -------------------------------------------------
    def _bands(self, n_rows: int, halo_lo: int, halo_hi: int):
        """Yield (band_start, band_stop, win_start, win_stop) row ranges."""
        for start in range(0, n_rows, self.tile_rows):
            stop = min(start + self.tile_rows, n_rows)
            win_lo = max(0, start - halo_lo)
            win_hi = min(n_rows, stop + halo_hi)
            yield start, stop, win_lo, win_hi

    def _run(self, dem: np.ndarray, halo: Tuple[int, int], fn) -> np.ndarray:
        """Apply ``fn(window, rows_slice)`` per band and stitch the output.

        ``fn`` receives the halo-extended window and the slice selecting the
        band's rows within the window; it returns the band's output rows.
        """
        n_rows = dem.shape[0]
        halo_lo, halo_hi = halo
        out = None
        for start, stop, win_lo, win_hi in self._bands(n_rows, halo_lo, halo_hi):
            window = jnp.asarray(dem[win_lo:win_hi])
            rows = slice(start - win_lo, stop - win_lo)
            band_out = np.asarray(fn(window, rows))
            if out is None:
                out_shape = (n_rows,) + band_out.shape[1:]
                out = np.empty(out_shape, dtype=band_out.dtype)
            out[start:stop] = band_out
            del band_out
        return out

    # -- descriptors -------------------------------------------------------
    def gaussian(self, dem: np.ndarray, sigma, truncate: float = 4.0):
        """Banded scipy-parity Gaussian (reference dem op, topo.py:62-80)."""
        sig_y = sigma if np.isscalar(sigma) else sigma[0]
        r = gaussian_radius(sig_y, truncate) if sig_y else 0

        def fn(window, rows):
            return ops.gaussian_filter(window, sigma, truncate)[rows]

        return self._run(dem, (r, r), fn)

    def tpi(self, dem: np.ndarray, size: int, sigma: Optional[float] = None):
        """Banded TPI (reference topo.py:145-181)."""
        r_smooth = gaussian_radius(sigma) if sigma else 0
        halo = size // 2 + r_smooth
        center = float(np.round(np.nanmean(dem, dtype=np.float64)))

        def fn(window, rows):
            return ops.tpi(window, size, sigma, center=center)[rows]

        return self._run(dem, (halo, halo), fn)

    def std(self, dem: np.ndarray, size: int, sigma: Optional[float] = None):
        """Banded rolling STD (reference topo.py:272-307)."""
        r_smooth = gaussian_radius(sigma) if sigma else 0
        halo = size // 2 + r_smooth
        center = float(np.round(np.nanmean(dem, dtype=np.float64)))

        def fn(window, rows):
            return ops.std(window, size, sigma, center=center)[rows]

        return self._run(dem, (halo, halo), fn)

    def gradient(
        self,
        dem: np.ndarray,
        sigma: float,
        res_meters: Dict[str, np.ndarray],
        sig_ratio: float = 1.0,
    ) -> List[np.ndarray]:
        """Banded gradient/slope/aspect (reference topo.py:597-644)."""
        if sigma <= 1:
            halo = 1
        else:
            halo = gaussian_radius(max(sigma, sigma * sig_ratio)) + 1

        x_res = np.asarray(res_meters["x"])
        y_res = np.asarray(res_meters["y"])

        def fn_for(idx):
            def fn(window, rows, win_lo, win_hi):
                res_w = {
                    "x": x_res if x_res.ndim == 1 else x_res[win_lo:win_hi],
                    "y": y_res[win_lo:win_hi],
                }
                return ops.gradient(window, sigma, res_w, sig_ratio)[idx][rows]

            return fn

        outs = []
        for idx in range(4):
            outs.append(self._run_windowed(dem, (halo, halo), fn_for(idx)))
        return outs

    def _run_windowed(self, dem, halo, fn):
        """Like _run but fn also receives the window's global row range."""
        n_rows = dem.shape[0]
        out = None
        for start, stop, win_lo, win_hi in self._bands(n_rows, *halo):
            window = jnp.asarray(dem[win_lo:win_hi])
            rows = slice(start - win_lo, stop - win_lo)
            band_out = np.asarray(fn(window, rows, win_lo, win_hi))
            if out is None:
                out = np.empty((n_rows,) + band_out.shape[1:], band_out.dtype)
            out[start:stop] = band_out
        return out

    def valley_ridge(
        self,
        dem: np.ndarray,
        size: int,
        mode: str,
        flat_list: Sequence[float] = (0, 0.15, 0.3),
        sigma: Optional[float] = None,
    ) -> List[np.ndarray]:
        """Banded valley/ridge (reference topo.py:389-453). Global
        standardization stats come from a host-side float64 pass; note the
        reference standardizes the *smoothed* field (topo.py:427-429), so
        with sigma the stats pass smooths host-side first."""
        bank = prepare_valley_bank(size, mode, tuple(flat_list))
        ky = bank.shape[2]
        r_smooth = gaussian_radius(sigma) if sigma else 0
        halo = ky // 2 + 1 + r_smooth

        field = dem
        if sigma:
            from scipy import ndimage  # host-side stats pass only

            field = ndimage.gaussian_filter(dem.astype(np.float32), sigma)
        mean = float(np.mean(field, dtype=np.float64))
        # np.std semantics (ddof=0) in float64
        var = float(np.mean((field.astype(np.float64) - mean) ** 2))
        stats = (mean, float(np.sqrt(var)))

        def fn_norm(window, rows):
            return ops.valley_ridge(
                window, size, mode, list(flat_list), sigma, bank=bank,
                stats=stats,
            )[0][rows]

        def fn_dir(window, rows):
            return ops.valley_ridge(
                window, size, mode, list(flat_list), sigma, bank=bank,
                stats=stats,
            )[1][rows]

        return [
            self._run(dem, (halo, halo), fn_norm),
            self._run(dem, (halo, halo), fn_dir),
        ]

    def sx(
        self,
        dem: np.ndarray,
        offsets: np.ndarray,
        distances: np.ndarray,
        border: int,
        height: float = 10.0,
    ) -> np.ndarray:
        """Banded Sx (reference topo.py:928-953). The zero border belongs to
        the *global* frame, so the per-window border mask is disabled and
        applied once at the end."""
        b = int(border)

        def fn(window, rows):
            return ops.sx(
                window, offsets, distances, border, height, zero_border=False
            )[rows]

        out = self._run(dem, (b, b), fn)
        h, w = out.shape
        out[:b, :] = 0.0
        out[h - b :, :] = 0.0
        out[:, :b] = 0.0
        out[:, w - b :] = 0.0
        return out

    def sx_sweep(
        self,
        dem: np.ndarray,
        offsets: np.ndarray,
        distances: np.ndarray,
        border: int,
        height: float = 10.0,
    ) -> np.ndarray:
        """Banded Sx azimuth sweep -> (A, H, W): each band's halo window is
        shipped to the device once and every azimuth of the fan reduces over
        it (the per-azimuth analog re-ships the window A times). The zero
        border belongs to the *global* frame, applied once at the end."""
        b = int(border)
        n_rows, w = dem.shape
        out = None
        for start, stop, win_lo, win_hi in self._bands(n_rows, b, b):
            window = jnp.asarray(dem[win_lo:win_hi])
            rows = slice(start - win_lo, stop - win_lo)
            band = np.asarray(
                ops.sx_sweep(window, offsets, distances, border, height,
                             zero_border=False)
            )[:, rows]
            if out is None:
                out = np.empty((band.shape[0], n_rows, w), band.dtype)
            out[:, start:stop] = band
            del band
        out[:, :b, :] = 0.0
        out[:, n_rows - b :, :] = 0.0
        out[:, :, :b] = 0.0
        out[:, :, w - b :] = 0.0
        return out
