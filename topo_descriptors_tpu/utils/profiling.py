"""Profiling and roofline observability.

The reference's only instrumentation is the @timer log line
(helpers.py:157-168). Production TPU runs need more: device traces for
xprof, per-op throughput, and a roofline model saying how far an op sits
from the hardware ceiling. All host-side and optional — nothing here
touches the compute path.
"""

from __future__ import annotations

import contextlib
import logging
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from topo_descriptors_tpu.utils.timing import Timings

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace (view with xprof/tensorboard).

    Usage::

        with device_trace("/tmp/trace"):
            result = jax.block_until_ready(op(dem))
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"device trace written to {logdir}")


def throughput_report(pixels: int) -> Dict[str, float]:
    """Mpixel/s per recorded timer label (utils.timing.Timings registry)."""
    report = {}
    for name, samples in Timings.samples.items():
        best = min(samples)
        report[name] = pixels / 1e6 / best if best > 0 else float("inf")
    return report


# --- roofline model ----------------------------------------------------------


@dataclass
class Roofline:
    """Per-chip hardware ceilings (defaults: TPU v5e)."""

    hbm_gbps: float = 819.0
    vpu_tflops: float = 3.9  # f32 elementwise
    mxu_tflops_f32: float = 49.0  # ~bf16/8 for HIGHEST-precision passes
    fft_tflops: float = 10.0  # measured practical FFT rate

    def sx_light_speed_ms(self, pixels: int, n_offsets: int) -> float:
        """Sx lower bound: VPU-bound at 3 ops per (pixel, ray offset)."""
        flops = pixels * n_offsets * 3.0
        return flops / (self.vpu_tflops * 1e12) * 1e3

    def fft_conv_light_speed_ms(self, fft_pixels: int, n_transforms: int) -> float:
        """FFT-conv lower bound: 5 N log2 N real flops per transform."""
        flops = n_transforms * 5.0 * fft_pixels * np.log2(max(fft_pixels, 2))
        return flops / (self.fft_tflops * 1e12) * 1e3

    def hbm_light_speed_ms(self, bytes_moved: int) -> float:
        return bytes_moved / (self.hbm_gbps * 1e9) * 1e3
