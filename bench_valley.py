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
    if "--only-full" in sys.argv:
        scales = [(100000.0, 1)]

    # --ballast G: pre-allocate G GiB of HBM before running, to BRACKET the
    # op's true peak working set experimentally (the relay exposes no
    # memory_stats — returns None — and device_memory_profile fatally
    # crashes in the PJRT C-API; measured 2026-08-21). If the op still
    # completes with G GiB held, its peak fits in (HBM - G).
    ballast = None
    for arg in sys.argv[1:]:
        if arg.startswith("--ballast="):
            gib = float(arg.split("=")[1])
            n_elts = int(gib * 2**30 / 4)
            ballast = jnp.ones((n_elts,), jnp.float32)
            float(ballast[0])  # materialize before timing
            print(f"holding {gib:.1f} GiB HBM ballast", flush=True)

    for scale_m, iters in scales:
        size = int(round_up_to_odd(scale_m / 30.0))
        nbytes = bank_nbytes(size, 3)
        # route exactly like valley_ridge(method='auto') so the label and
        # roofline model always match the path the op actually executes
        streamed = nbytes > CFG.valley_bank_max_bytes
        from topo_descriptors_tpu.kernels.valley import rotated_extent

        ky, kx = rotated_extent(size, np.arange(180))
        stack = 46 * 3 * max(ky, kx) ** 2 * 4  # padded to q_batch=2
        cached = streamed and stack <= CFG.valley_canvas_cache_bytes
        label = (
            "streamed-mm, canvas cache" if cached
            else ("streamed-mm" if streamed else "bank-mm")
        )

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
        method = (
            "mm_cached" if cached
            else ("mm_stream" if streamed else "mm_bank")
        )
        ls = roof.valley_ridge_light_speed_ms(h, w, size, method=method)
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
        line = (
            f"valley {scale_m/1000:.0f}km (size {size}, bank "
            f"{nbytes/1e9:.2f} GB, {label}): {sec:.2f} s "
            f"-> {h*w/1e6/sec:.2f} Mpix/s; roofline {ls/1e3:.2f} s "
            f"({ls/1e3/sec*100:.0f}% of ceiling); first call {t_first:.1f} s; "
            f"host RSS {rss/2**30:.2f} GiB"
        )
        if ballast is not None:
            line += (
                f"; completed with {ballast.nbytes/2**30:.1f} GiB HBM "
                f"ballast held (peak working set <= "
                f"{16 - ballast.nbytes/2**30:.1f} GiB)"
            )
        print(line, flush=True)
        if scale_m >= 100000.0:
            # persisted so bench_details.py can include the row in the
            # regenerated BENCH_DETAILS.md (hand-merged rows get erased)
            with open("BENCH_VALLEY_FULL.txt", "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
