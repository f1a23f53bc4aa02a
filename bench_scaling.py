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


if __name__ == "__main__":
    main()
