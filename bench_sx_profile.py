"""Measured breakdown of the block-resident Sx Pallas kernel (VERDICT r4
task 4).

Round 4 attributed the kernel's 6-11%-of-roofline showing at production
grid sizes to "per-program grid overhead and window DMA" without measuring
either. This script tests the attribution directly on the real chip:

* **block-size sweep** — the (256, 512) auto_block shape means 512 programs
  at 8192^2; if fixed per-program cost dominates, throughput scales with
  block area;
* **variant ablation** at fixed block shape, each its own Mosaic program:
  - ``full``      DMA halo window + K-ray grouped reduction (the real op)
  - ``dma_only``  DMA halo window, skip the reduction
  - ``compute``   skip the DMA, reduce over uninitialized VMEM scratch
  - ``noop``      neither: write a constant block (pure per-program cost)

  full - dma_only ~ compute time; full - compute ~ DMA time; noop = fixed
  per-program overhead. All timings are dispatch-amortized (R iterations
  inside one jitted scan, scalar-fetch sync — see bench.py).

Each (variant, block) pair costs one ~20 s Mosaic compile through the
remote-compile relay (not persisted by JAX's cache), so the matrix is kept
small. Results feed BENCH_DETAILS.md and the auto_block policy.
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from topo_descriptors_tpu.io.synthetic import synthetic_dem
    from topo_descriptors_tpu.kernels.sx_geometry import sx_dedupe, sx_offsets
    from topo_descriptors_tpu.ops.pallas.sx_block import _tree_fmax
    from topo_descriptors_tpu.utils.profiling import Roofline

    n = 8192
    for arg in sys.argv[1:]:
        if arg.startswith("--n="):
            n = int(arg.split("=")[1])

    offsets, distances, border = sx_offsets(0.0, 500.0, 30.0, 30.0)
    offsets, distances = sx_dedupe(offsets, distances)
    b = int(border)
    with np.errstate(divide="ignore"):
        inv = (1.0 / np.asarray(distances)).astype(np.float32)
    groups: dict = {}
    for (oy, ox), iv in zip(np.asarray(offsets), inv):
        groups.setdefault(float(iv), []).append((int(oy) + b, int(ox) + b))
    dist_table = tuple((iv, tuple(g)) for iv, g in sorted(groups.items()))
    k_rays, n_groups = len(offsets), len(dist_table)
    roof_ms = Roofline().sx_light_speed_ms(n * n, k_rays, n_groups)
    print(
        f"grid {n}^2, K={k_rays} deduped rays in {n_groups} distance groups, "
        f"border {b}; grouped-VPU roofline {roof_ms:.2f} ms",
        flush=True,
    )

    dem = jnp.asarray(synthetic_dem(n, n, seed=2))

    def kernel(dem_ref, out_ref, scratch, sem, *, mode, block, window_shape,
               grid, n_acc=4):
        by, bx = block
        gy, gx = grid
        wy, wx = window_shape
        i = pl.program_id(0)
        j = pl.program_id(1)
        linear = i * gx + j
        slot = jax.lax.rem(linear, 2)

        def copy_for(lin, s):
            bi = lin // gx
            bj = jax.lax.rem(lin, gx)
            return pltpu.make_async_copy(
                dem_ref.at[pl.ds(bi * by, wy), pl.ds(bj * bx, wx)],
                scratch.at[s],
                sem.at[s],
            )

        if mode == "noop":
            out_ref[:] = jnp.zeros((by, bx), jnp.float32)
            return
        if mode in ("full", "dma_only"):
            @pl.when(linear == 0)
            def _first():
                copy_for(linear, slot).start()

            @pl.when(linear + 1 < gy * gx)
            def _prefetch_next():
                copy_for(linear + 1, 1 - slot).start()

            copy_for(linear, slot).wait()
        window = scratch[slot]
        base = window[b : b + by, b : b + bx] + jnp.float32(10.0)
        if mode == "dma_only":
            out_ref[:] = base
            return
        accs = [jnp.full((by, bx), -jnp.inf, jnp.float32)
                for _ in range(n_acc)]
        if mode == "compute_nopanel":
            for gi, (inv_g, grp) in enumerate(dist_table):
                best = _tree_fmax(
                    [window[oy : oy + by, ox : ox + bx] for oy, ox in grp]
                )
                k = gi % n_acc
                accs[k] = jnp.fmax(accs[k],
                                   (best - base) * jnp.float32(inv_g))
            out_ref[:] = _tree_fmax(accs)
            return
        # production kernel form: lane rotations hoisted into per-ox panels
        panels = {
            ox: window[:, ox : ox + bx]
            for ox in sorted({o[1] for _, grp in dist_table for o in grp})
        }
        for gi, (inv_g, grp) in enumerate(dist_table):
            best = _tree_fmax(
                [panels[ox][oy : oy + by, :] for oy, ox in grp]
            )
            k = gi % n_acc
            accs[k] = jnp.fmax(accs[k], (best - base) * jnp.float32(inv_g))
        out_ref[:] = _tree_fmax(accs)

    def timed(block, mode, r_iters=6, repeats=3):
        by, bx = block
        gy, gx = -(-n // by), -(-n // bx)
        wy = -((-(by + 2 * b)) // 8) * 8
        wx = -((-(bx + 2 * b)) // 128) * 128
        pad_y = (gy - 1) * by + wy - (n + b)
        pad_x = (gx - 1) * bx + wx - (n + b)

        def f(x):
            padded = jnp.pad(x, ((b, pad_y), (b, pad_x)),
                             constant_values=np.nan)
            kern = functools.partial(
                kernel, mode=mode, block=block, window_shape=(wy, wx),
                grid=(gy, gx),
            )
            out = pl.pallas_call(
                kern,
                grid=(gy, gx),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((by, bx), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, wy, wx), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                out_shape=jax.ShapeDtypeStruct((gy * by, gx * bx),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(padded)
            return out[:n, :n]

        @jax.jit
        def prog(x, seeds):
            def step(acc, s):
                return acc + jnp.nansum(f(x + s)), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), seeds)
            return acc

        seeds = jnp.arange(r_iters, dtype=jnp.float32) * 1e-3
        t0 = time.perf_counter()
        float(prog(dem, seeds))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(prog(dem, seeds))
            ts.append((time.perf_counter() - t0) / r_iters)
        return min(ts), compile_s

    blocks = [(256, 512), (512, 512), (256, 1024)]
    results = {}
    for blk in blocks:
        try:
            t, comp = timed(blk, "full")
        except Exception as exc:
            print(f"block {blk}: FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:200]})", flush=True)
            continue
        n_prog = (-(-n // blk[0])) * (-(-n // blk[1]))
        results[blk] = t
        print(
            f"block {blk}: full {t*1e3:.2f} ms ({n*n/1e6/t:.0f} Mpix/s, "
            f"{roof_ms/(t*1e3)*100:.0f}% of roofline, {n_prog} programs, "
            f"compile {comp:.0f} s)",
            flush=True,
        )

    best = min(results, key=results.get)
    for blk in {(256, 512), best}:
        parts = {"full": results[blk]}
        for mode in ("dma_only", "compute", "noop", "compute_nopanel"):
            try:
                parts[mode], _ = timed(blk, mode)
            except Exception as exc:
                print(f"block {blk} {mode}: FAILED ({str(exc)[:160]})",
                      flush=True)
        if {"dma_only", "compute", "noop"} <= parts.keys():
            extra = (f", nopanel-reduction ~"
                     f"{(parts['compute_nopanel']-parts['noop'])*1e3:.2f} ms"
                     if "compute_nopanel" in parts else "")
            n_prog = (-(-n // blk[0])) * (-(-n // blk[1]))
            print(
                f"block {blk} breakdown: full {parts['full']*1e3:.2f} | "
                f"dma_only {parts['dma_only']*1e3:.2f} | compute-only "
                f"{parts['compute']*1e3:.2f} | noop {parts['noop']*1e3:.2f} ms"
                f" -> per-program overhead {parts['noop']/n_prog*1e6:.1f} us, "
                f"DMA ~{(parts['dma_only']-parts['noop'])*1e3:.2f} ms, "
                f"reduction ~{(parts['compute']-parts['noop'])*1e3:.2f} ms"
                + extra,
                flush=True,
            )


if __name__ == "__main__":
    main()
