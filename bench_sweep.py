"""Measure the Sx azimuth-sweep backends on the real chip.

Compares, at the Basodino grid (900x1440) with a 36-azimuth fan:
  * xla          — lax.map over azimuths of the K-offset scan
  * pallas_sweep — the CSR whole-fan Mosaic kernel (runtime offset tables)
  * pallas       — per-azimuth constant-offset kernels (36 Mosaic compiles)

Prints ms/azimuth for each at r=500 m and r=2000 m.  VERDICT r2 item #2
target: <= ~2.2 ms/azimuth at r=2000.
"""

import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def amortized_seconds(fn, arg, iters=8, warmup=2, repeats=3):
    import jax.numpy as jnp

    for _ in range(warmup):
        # scalar sync (see bench.py): full-field fetches stall intermittently
        float(jnp.sum(jnp.nan_to_num(fn(arg))))
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        results = [fn(arg) for _ in range(iters)]
        float(jnp.sum(results[-1]))
        rates.append((time.perf_counter() - t0) / iters)
    return min(rates)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from topo_descriptors_tpu import ops
    from topo_descriptors_tpu.io.synthetic import basodino_like_dem
    from topo_descriptors_tpu.kernels.sx_geometry import sx_sweep_offsets

    print(f"device: {jax.devices()[0]}", flush=True)
    raster = basodino_like_dem(projected=True)  # 900 x 1440 at 30 m
    dem = jax.device_put(np.asarray(raster.data, np.float32))
    azimuths = np.arange(0.0, 360.0, 10.0)
    n_az = len(azimuths)

    for radius in (500.0, 2000.0):
        offs, dists, border = sx_sweep_offsets(azimuths, radius, 30.0, 30.0)
        print(f"r={radius:.0f}m border={border} kmax={offs.shape[1]}",
              flush=True)
        for method in ("xla", "pallas", "pallas_fan", "pallas_sweep"):
            fn = jax.jit(
                lambda d, m=method, o=offs, di=dists, b=border:
                ops.sx_sweep(d, o, di, b, method=m)
            )
            try:
                import jax.numpy as jnp
                t0 = time.perf_counter()
                # scalar sync: full-field fetches through the relay stall
                float(jnp.sum(jnp.nan_to_num(fn(dem))))
                compile_s = time.perf_counter() - t0
                sec = amortized_seconds(fn, dem)
                print(
                    f"  {method:13s} {sec*1e3/n_az:7.2f} ms/az "
                    f"(total {sec*1e3:8.1f} ms, first-call "
                    f"{compile_s:.1f} s)",
                    flush=True,
                )
            except Exception as e:
                print(f"  {method:13s} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
