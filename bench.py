"""Benchmark harness — run on real TPU hardware.

Measures the north-star metric (BASELINE.json): Mpixel/s per chip for
TPI-2000m and Sx-500m on an SRTM-30m Basodino-sized grid (~1440x900,
1.30 Mpixel), and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "Mpixel/s", "vs_baseline": N}

``value`` is the geometric mean of the two throughputs; ``vs_baseline``
compares against the reference's derived CPU numbers (TPI ~1.3 Mpixel/s,
Sx ~0.22 Mpixel/s; BASELINE.md). Per-op details go to stderr.
"""

import json
import sys
import time

import numpy as np


def _best_time(fn, *args, warmup=2, iters=10):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    from topo_descriptors_tpu import ops
    from topo_descriptors_tpu.geo import round_up_to_odd
    from topo_descriptors_tpu.io.synthetic import basodino_like_dem
    from topo_descriptors_tpu.kernels.sx_geometry import sx_offsets

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    raster = basodino_like_dem(projected=True)  # 900 x 1440 at 30 m
    dem = jnp.asarray(raster.data)
    npix = dem.shape[0] * dem.shape[1]
    mpix = npix / 1e6

    # --- TPI at 2000 m (67 px disk) ---------------------------------------
    size = int(round_up_to_odd(2000 / 30.0))
    tpi_fn = jax.jit(lambda x: ops.tpi(x, size))
    t_tpi = _best_time(tpi_fn, dem)
    tpi_rate = mpix / t_tpi
    print(
        f"TPI-2000m (size {size}): {t_tpi*1e3:.2f} ms -> {tpi_rate:.1f} Mpixel/s",
        file=sys.stderr,
    )

    # --- Sx at 500 m, azimuth 0 -------------------------------------------
    offsets, distances, border = sx_offsets(0.0, 500.0, 30.0, 30.0)
    sx_fn = jax.jit(lambda x: ops.sx(x, offsets, distances, border))
    t_sx = _best_time(sx_fn, dem)
    sx_rate = mpix / t_sx
    print(
        f"Sx-500m ({offsets.shape[0]} ray px): {t_sx*1e3:.2f} ms -> "
        f"{sx_rate:.1f} Mpixel/s",
        file=sys.stderr,
    )

    value = float(np.sqrt(tpi_rate * sx_rate))
    baseline = float(np.sqrt(1.3 * 0.22))  # reference CPU numbers, BASELINE.md
    print(
        json.dumps(
            {
                "metric": "geomean Mpixel/s per chip (TPI-2000m, Sx-500m, SRTM-30m)",
                "value": round(value, 2),
                "unit": "Mpixel/s",
                "vs_baseline": round(value / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
