"""Valley/ridge benchmark rows for BENCH_DETAILS.

Measures compute_valley-equivalent single calls on the Basodino grid at
2 km (scipy bank + matmul-DFT convs) and 20 km (on-device quadrant
rotation + matmul-DFT convs), and reports %-of-roofline from the
utils.profiling.Roofline model for each path.

``--full`` additionally executes the reference's LARGEST example scale —
100 km (scripts/compute_topo_descriptors.py:63-72, size 3335, a 48 GB
static bank if materialized) — once, end to end on the real chip,
recording wall time, peak device (HBM) memory and peak host RSS
(VERDICT r3 item #4).
"""

import os
import resource
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _device_peak_bytes(dev):
    try:
        stats = dev.memory_stats()
        return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
    except Exception:
        return 0


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    import jax.numpy as jnp

    from topo_descriptors_tpu.config import CFG
    from topo_descriptors_tpu.geo import round_up_to_odd
    from topo_descriptors_tpu.io.synthetic import basodino_like_dem
    from topo_descriptors_tpu.ops.valley_ridge import (
        bank_nbytes,
        valley_ridge,
        valley_ridge_streamed,
    )
    from topo_descriptors_tpu.utils.profiling import Roofline

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    raster = basodino_like_dem(projected=True)  # 900 x 1440 at 30 m
    dem = jax.device_put(np.asarray(raster.data, np.float32))
    h, w = dem.shape
    roof = Roofline()

    scales = [(2000.0, 5), (20000.0, 1)]
    if "--full" in sys.argv:
        scales.append((100000.0, 1))

    for scale_m, iters in scales:
        size = int(round_up_to_odd(scale_m / 30.0))
        nbytes = bank_nbytes(size, 3)
        # route exactly like valley_ridge(method='auto') so the label and
        # roofline model always match the path the op actually executes
        streamed = nbytes > CFG.valley_bank_max_bytes
        label = "streamed-mm" if streamed else "bank-mm"

        def run():
            # both paths manage their own jits + device bank/table caches
            if streamed:
                outs = valley_ridge_streamed(dem, size, "valley")
            else:
                outs = valley_ridge(dem, size, "valley")
            # sync on scalars (both outputs): a full-field np.asarray fetch
            # through the relay costs many seconds and is not compute
            float(jnp.sum(outs[0]))
            float(jnp.sum(outs[1]))

        t0 = time.perf_counter()
        run()  # warmup/compile
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        sec = (time.perf_counter() - t0) / iters
        ls = roof.valley_ridge_light_speed_ms(
            h, w, size, method="mm_stream" if streamed else "mm_bank"
        )
        hbm = _device_peak_bytes(dev)
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
        print(
            f"valley {scale_m/1000:.0f}km (size {size}, bank "
            f"{nbytes/1e9:.2f} GB, {label}): {sec:.2f} s "
            f"-> {h*w/1e6/sec:.1f} Mpix/s; roofline {ls/1e3:.2f} s "
            f"({ls/1e3/sec*100:.0f}% of ceiling); first call {t_first:.1f} s; "
            f"peak HBM {hbm/2**30:.2f} GiB, host RSS {rss/2**30:.2f} GiB",
            flush=True,
        )


if __name__ == "__main__":
    main()
