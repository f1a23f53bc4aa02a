"""Sharding-overhead benchmark over the spatial device mesh.

BASELINE.md's scaling target is >= 80% weak-scaling efficiency at N >= 2
workers. Real multi-chip hardware is not attached to this environment, and
N virtual XLA host devices all share one physical CPU, so per-device
throughput cannot stay constant here by construction. What CAN be measured
faithfully on virtual devices is the *cost the decomposition adds*: the same
global grid computed unsharded vs sharded over a 1xN / 2x(N/2) mesh runs the
identical arithmetic plus partitioning + halo-exchange collectives — the
exact terms weak scaling loses on real hardware (where the arithmetic term
scales and only these overheads remain).

Prints one JSON line per mesh with the overhead fraction; on a real pod
slice the same ShardedOps programs run unchanged with ICI collectives.

Usage: python bench_scaling.py [--size 1024] [--iters 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from topo_descriptors_tpu import ops
    from topo_descriptors_tpu.io.synthetic import synthetic_dem
    from topo_descriptors_tpu.kernels.sx_geometry import sx_offsets
    from topo_descriptors_tpu.parallel.mesh import make_mesh
    from topo_descriptors_tpu.parallel.sharded import ShardedOps

    shape = (args.size, args.size)
    dem_np = synthetic_dem(*shape, seed=1)
    mpix = shape[0] * shape[1] / 1e6
    offsets, distances, border = sx_offsets(0.0, 500.0, 30.0, 30.0)

    def timed(step, arg):
        jax.block_until_ready(step(arg))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(step(arg))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # single-device baseline: identical descriptor battery
    def single_step(x):
        return (
            ops.tpi(x, 17),
            ops.std(x, 17),
            ops.sx(x, offsets, distances, border),
        )

    t_single = timed(jax.jit(single_step), jnp.asarray(dem_np))
    print(
        json.dumps(
            {"mesh": "1x1", "seconds": round(t_single, 4),
             "mpix_per_s": round(mpix / t_single, 2), "overhead": 0.0}
        )
    )

    for mesh_shape in [(1, 2), (1, 4), (2, 4)]:
        n = mesh_shape[0] * mesh_shape[1]
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(shape=mesh_shape, devices=jax.devices()[:n])
        sops = ShardedOps(mesh)
        dem_s = sops.put(dem_np)

        def sharded_step(x):
            return (
                sops.tpi(x, 17),
                sops.std(x, 17),
                sops.sx(x, offsets, distances, border),
            )

        t = timed(sharded_step, dem_s)
        overhead = t / t_single - 1.0
        print(
            json.dumps(
                {
                    "mesh": f"{mesh_shape[0]}x{mesh_shape[1]}",
                    "seconds": round(t, 4),
                    "mpix_per_s": round(mpix / t, 2),
                    "overhead": round(overhead, 3),
                }
            )
        )
        print(
            f"mesh {mesh_shape}: partition+halo overhead {overhead:+.1%} "
            f"(weak-scaling efficiency on real chips ~ "
            f"{1/(1+max(overhead,0)):.0%} upper bound from these terms)",
            file=sys.stderr,
        )

    # --- per-descriptor-family overhead rows (VERDICT r4 task 6) ----------
    # Each round-4 mesh path gets its own measured partition+halo overhead
    # on the largest virtual mesh; grids sized for CPU tractability.
    n_dev = min(8, len(jax.devices()))
    fam_mesh = (2, 4) if n_dev >= 8 else (1, n_dev)
    mesh = make_mesh(shape=fam_mesh, devices=jax.devices()[: fam_mesh[0] * fam_mesh[1]])
    sops = ShardedOps(mesh)
    fam_np = synthetic_dem(256, 256, seed=3)
    fam = jnp.asarray(fam_np)
    fam_s = sops.put(fam_np)
    res = {
        "x": np.full(256, 30.0, np.float32),
        "y": np.full(256, -30.0, np.float32),
    }
    az8 = list(np.arange(0.0, 360.0, 45.0))
    from topo_descriptors_tpu.kernels.sx_geometry import sx_sweep_offsets
    from topo_descriptors_tpu.ops.valley_ridge import valley_ridge, valley_ridge_streamed

    so, sd, sb = sx_sweep_offsets(az8, 500.0, 30.0, 30.0)

    families = [
        (
            "gradient",
            jax.jit(lambda x: tuple(ops.gradient(x, 5.0, res, 1.0))),
            lambda x: tuple(sops.gradient(x, 5.0, res, 1.0)),
        ),
        (
            "valley_ridge_bank",
            lambda x: tuple(valley_ridge(x, 17, "valley")),
            lambda x: tuple(sops.valley_ridge(x, 17, "valley")),
        ),
        (
            "valley_ridge_streamed",
            lambda x: tuple(valley_ridge_streamed(x, 61, "valley")),
            lambda x: tuple(sops.valley_ridge_streamed(x, 61, "valley")),
        ),
        (
            "sx_sweep_8az",
            jax.jit(lambda x: ops.sx_sweep(x, so, sd, sb)),
            lambda x: sops.sx_sweep(x, so, sd, sb),
        ),
    ]
    fam_mpix = 256 * 256 / 1e6
    for name, single_fn, sharded_fn in families:
        t1 = timed(single_fn, fam)
        tn = timed(sharded_fn, fam_s)
        print(
            json.dumps(
                {
                    "op": name,
                    "mesh": f"{fam_mesh[0]}x{fam_mesh[1]}",
                    "seconds_single": round(t1, 4),
                    "seconds_sharded": round(tn, 4),
                    "mpix_per_s_single": round(fam_mpix / t1, 2),
                    "overhead": round(tn / t1 - 1.0, 3),
                }
            )
        )

    # --- streamed valley: replicated-work fraction vs block size ----------
    # The sharded streamed path replicates the rotation gathers and the
    # kernel-side forward DFT on every device (parallel/sharded.py's own
    # caveat). Measure that fraction directly: time a jit that runs ONLY
    # the 46 quadrant rotations + flat-combine + variants + kernel forward
    # DFT (no field conv), as a function of grid (= per-device block) size.
    import functools

    from topo_descriptors_tpu.kernels.valley import rotated_extent, valley_kernels
    from topo_descriptors_tpu.ops.dft_conv import get_plan
    from topo_descriptors_tpu.ops.spline_rotate import (
        build_rotation_table,
        canvas_variants,
        prefilter2d_o2,
        quadrant_schedule,
        rotation_params,
        rotate_std_canvas_table,
    )
    from topo_descriptors_tpu.ops.valley_ridge import _flat_axis_combine

    vsize = 61
    kymax, kxmax = rotated_extent(vsize, np.arange(180))
    kmax = max(kymax, kxmax)
    base = valley_kernels(vsize, (0, 0.15, 0.3)).astype(np.float32)
    q_angles, _, _ = quadrant_schedule(180)
    qp = jnp.asarray(
        np.stack([rotation_params(vsize, float(q), kmax, kmax) for q in q_angles])
    )
    table = build_rotation_table(prefilter2d_o2(jnp.asarray(base)))
    PH = jax.lax.Precision.HIGH
    d = functools.partial(jnp.einsum, "bij,jk->bik", precision=PH)
    dl = functools.partial(jnp.einsum, "uj,bjk->buk", precision=PH)

    points = []
    for grid in (192, 320, 512):
        plan = get_plan(grid, grid, kmax, kmax, "same")
        cxf, sxf, cyf, syf = (jnp.asarray(m) for m in plan.mats[:4])

        @jax.jit
        def rot_only(table, qp, cxf=cxf, sxf=sxf, cyf=cyf, syf=syf):
            def body(acc, params):
                canvas = rotate_std_canvas_table(table, vsize, params, (kmax, kmax))
                folded = _flat_axis_combine(canvas, axis=0)
                kern = jnp.concatenate(canvas_variants(folded, params), axis=0)
                s1r, s1i = d(kern, cxf), d(kern, sxf)
                fkr = dl(cyf, s1r) - dl(syf, s1i)
                fki = dl(cyf, s1i) + dl(syf, s1r)
                return acc + jnp.sum(fkr * fkr) + jnp.sum(fki * fki), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), qp)
            return acc

        t_rot = timed(lambda _x: rot_only(table, qp), fam)
        g_np = synthetic_dem(grid, grid, seed=4)
        t_full = timed(
            lambda x: tuple(valley_ridge_streamed(x, vsize, "valley")),
            jnp.asarray(g_np),
        )
        frac = t_rot / t_full
        n = fam_mesh[0] * fam_mesh[1]
        speedup_bound = 1.0 / (frac + (1.0 - frac) / n)
        points.append((grid, frac))
        print(
            json.dumps(
                {
                    "op": "valley_streamed_replicated_work",
                    "block": f"{grid}x{grid}",
                    "kernel_extent": kmax,
                    "seconds_full": round(t_full, 4),
                    "seconds_replicated": round(t_rot, 4),
                    "replicated_fraction": round(frac, 3),
                    "real_chip_speedup_bound": round(speedup_bound, 2),
                    "efficiency_bound": round(speedup_bound / n, 3),
                }
            )
        )
    # crossover: frac(g) = a / (a + b g^2) with a from the fixed rotation
    # cost and b fit from the largest measured point; >= 80% efficiency on
    # an N-device mesh needs frac <= 0.25/(N-1). The bound ignores
    # halo-overlap conv work, which vanishes in the same block >> kernel
    # limit where the bound is reached.
    g0, f0 = points[-1]
    n = fam_mesh[0] * fam_mesh[1]
    target = 0.25 / (n - 1)
    if f0 > 0:
        g_star = g0 * np.sqrt((f0 * (1 - target)) / (target * (1 - f0)))
        print(
            f"streamed valley (kernel extent {kmax}): mesh beats one chip at "
            f"every block size (replicated fraction < 1); >= 80% efficiency "
            f"on {n} devices needs replicated fraction <= {target:.3f}, i.e. "
            f"blocks >= ~{g_star:.0f}^2 at this kernel extent "
            f"(measured fractions: "
            + ", ".join(f"{g}^2: {f:.1%}" for g, f in points)
            + ")",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
