"""Valley/ridge benchmark rows for BENCH_DETAILS (VERDICT r2 items #1/#10).

Measures compute_valley-equivalent single calls on the Basodino grid at
2 km (static bank, row-channel MXU conv) and 20 km (streamed on-device
rotation + hoisted FFT), and reports %-of-roofline from the
utils.profiling.Roofline model for each path.
"""

import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from topo_descriptors_tpu.config import CFG
    from topo_descriptors_tpu.geo import round_up_to_odd
    from topo_descriptors_tpu.io.synthetic import basodino_like_dem
    from topo_descriptors_tpu.ops.valley_ridge import (
        bank_nbytes,
        valley_ridge,
        valley_ridge_streamed,
    )
    from topo_descriptors_tpu.utils.profiling import Roofline

    print(f"device: {jax.devices()[0]}", flush=True)
    raster = basodino_like_dem(projected=True)  # 900 x 1440 at 30 m
    dem = jax.device_put(np.asarray(raster.data, np.float32))
    h, w = dem.shape
    roof = Roofline()

    for scale_m, iters in ((2000.0, 5), (20000.0, 1)):
        size = int(round_up_to_odd(scale_m / 30.0))
        nbytes = bank_nbytes(size, 3)
        # route exactly like valley_ridge(method='auto') so the label and
        # roofline model always match the path the op actually executes
        streamed = nbytes > CFG.valley_bank_max_bytes
        label = "streamed-fft" if streamed else "bank-mxu"

        import jax.numpy as jnp

        bank_jit = None if streamed else jax.jit(
            lambda x: valley_ridge(x, size, "valley")
        )

        def run():
            if streamed:
                outs = valley_ridge_streamed(dem, size, "valley")
            else:
                outs = bank_jit(dem)
            # sync on scalars (both outputs): a full-field np.asarray fetch
            # through the relay costs many seconds and is not compute
            float(jnp.sum(outs[0]))
            float(jnp.sum(outs[1]))

        run()  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        sec = (time.perf_counter() - t0) / iters
        ls = roof.valley_ridge_light_speed_ms(
            h, w, size, method="fft" if streamed else "direct"
        )
        print(
            f"valley {scale_m/1000:.0f}km (size {size}, bank "
            f"{nbytes/1e9:.2f} GB, {label}): {sec:.2f} s "
            f"-> {h*w/1e6/sec:.1f} Mpix/s; roofline {ls/1e3:.2f} s "
            f"({ls/1e3/sec*100:.0f}% of ceiling)",
            flush=True,
        )


if __name__ == "__main__":
    main()
