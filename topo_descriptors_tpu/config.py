"""Configuration for topo_descriptors_tpu.

The reference loads two knobs from ``config/topo_descriptors.conf`` via
``yaconfigobject`` (reference __init__.py:15, config/topo_descriptors.conf:1-5):

* ``min_elevation = -100`` — elevations <= this are masked to NaN at ingest
  (reference helpers.py:31)
* ``scale_std = 4`` — number of Gaussian standard deviations per unit scale,
  i.e. ``sigma = scale_pxl / 4`` (reference topo.py:49,573; helpers.py:131)

We keep both knobs with identical defaults, add the TPU-specific settings the
reference has no analogue for (mesh layout, tiling, dtype policy), and load
overrides from a simple ``key: value`` conf file or environment variables.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional, Tuple


@dataclasses.dataclass
class Config:
    # --- reference-compatible knobs (config/topo_descriptors.conf:1-5) ---
    min_elevation: float = -100.0
    scale_std: float = 4.0

    # --- TPU-native knobs (no reference analogue) ---
    # Preferred 2-D device mesh layout (gy, gx); None = auto square-ish.
    mesh_shape: Optional[Tuple[int, int]] = None
    # Compute dtype for descriptor math on device.
    compute_dtype: str = "float32"
    # Use FFT convolution when the kernel area exceeds this many taps
    # (mirrors scipy.signal.convolve's method='auto' switch, but tuned for
    # TPU: spatial convs with C_in=1 map terribly onto the MXU, so the
    # crossover to FFT sits far lower than scipy's).
    fft_conv_min_taps: int = 1024
    # Below this tap count, direct convs unroll into shifted fused
    # multiply-adds on the VPU instead of conv_general_dilated.
    shift_acc_max_taps: int = 1024
    # 1-D correlations (separable Gaussian) switch from shifted FMAs to
    # per-axis FFT above this tap count. Re-calibrated round 5 on v5e at
    # the Basodino grid: FMA 1.82/2.21/2.91/3.38 ms vs FFT
    # 2.91/2.30/2.32/3.04 ms at 49/73/97/135 taps — crossover between 73
    # and 97 (the old 160 left ~25% on the table for 100-160-tap sigmas,
    # e.g. the 2 km gradient pre-smooth).
    fft_correlate1d_min_taps: int = 88
    # {0,1}-valued kernels (disk stencils) of at least this many taps route
    # through the prefix-sum (summed-area) path: ~size row adds + 2 x
    # (distinct run widths) slice adds per pixel, exact and far below both
    # the direct conv's O(size^2) FMAs and the FFT's transpose traffic.
    sat_conv_min_taps: int = 128
    # (legacy, round <= 3) valley/ridge row-channel MXU conv: largest
    # row-stack to keep in HBM before the FFT formulation. The round-4
    # default is the partial-DFT matmul engine (ops/dft_conv.py); the
    # row-channel and FFT paths remain reachable via method='direct'/'fft'
    # for cross-checks but no automatic route consults this knob anymore.
    rowchan_max_bytes: int = 1536 * 1024 * 1024
    # valley/ridge: largest precomputed rotated-kernel bank to bake into the
    # device program as one static constant. Beyond this (the reference's own
    # 20-100 km example scales reach 17-48 GB) the angle loop streams
    # host-rotated chunks through a fixed-shape jit step instead, bounding
    # peak memory to O(one chunk).
    valley_bank_max_bytes: int = 192 * 1024 * 1024
    # streamed valley/ridge: target device size of one angle chunk's padded
    # kernel stack (the FFT intermediates are a small multiple of this).
    valley_chunk_bytes: int = 128 * 1024 * 1024
    # streamed valley/ridge: largest rotated+folded quadrant canvas stack to
    # keep device-resident per (size, mode, flats) signature. Rotation is an
    # input-independent product that banded/tiled drivers and warm services
    # recompute every call; caching it removes the ~46 gather rotations from
    # all but the first call (20 km stack ~0.5 GB; 100 km would be ~12 GB
    # and keeps the inline per-call rotation).
    valley_canvas_cache_bytes: int = 1024 * 1024 * 1024
    # Reproduce the reference's int32-truncation quirk in the rolling std
    # (reference topo.py:300). Set False for a cleaner float32 variance.
    std_int32_parity: bool = True
    # Persistent XLA/Mosaic compile cache. Some Sx fan configurations compile
    # one Pallas kernel per azimuth (~0.5 s each cold); the persistent cache
    # makes every later process pay ~nothing. Applied lazily the first time a
    # descriptor op runs (see ensure_compilation_cache); set to "" to disable.
    compilation_cache_dir: str = "~/.cache/topo_descriptors_tpu/jax"

    @classmethod
    def from_file(cls, path: str | os.PathLike) -> "Config":
        """Parse a minimal ``key: value`` conf file (one pair per line,
        ``#`` comments), the same shape as the reference's
        topo_descriptors.conf."""
        cfg = cls()
        text = Path(path).read_text()
        for line in text.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip()
            value = value.strip()
            if not hasattr(cfg, key):
                continue
            field_type = type(getattr(cfg, key))
            if field_type is bool:
                setattr(cfg, key, value.lower() in ("1", "true", "yes"))
            elif field_type in (int, float):
                setattr(cfg, key, field_type(float(value)))
            else:
                setattr(cfg, key, value)
        return cfg


_CACHE_CONFIGURED = False


def ensure_compilation_cache() -> None:
    """Point JAX's persistent compile cache at ``CFG.compilation_cache_dir``.

    Idempotent and cheap after the first call. Called by the descriptor ops
    that are compile-heavy (per-azimuth Sx Pallas kernels, the valley/ridge
    angle programs) so that a production user's *first* run already writes
    the cache and every later process starts warm. An explicit
    ``JAX_COMPILATION_CACHE_DIR`` env var wins; ``compilation_cache_dir: ""``
    in the conf disables."""
    global _CACHE_CONFIGURED
    if _CACHE_CONFIGURED:
        return
    _CACHE_CONFIGURED = True
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already chose a cache location
    path = CFG.compilation_cache_dir
    if not path:
        return
    path = os.path.expanduser(path)
    try:
        import jax

        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: the per-azimuth Sx kernels are ~0.5 s
        # each but there can be dozens per fan
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _load_default() -> Config:
    path = os.environ.get("TOPO_TPU_CONFIG")
    if path and Path(path).exists():
        return Config.from_file(path)
    default = Path(__file__).with_name("topo_descriptors_tpu.conf")
    if default.exists():
        return Config.from_file(default)
    return Config()


CFG = _load_default()
