"""Detailed benchmark across the BASELINE.json configs — run on real TPU.

Covers every driver-set benchmark config (BASELINE.json "configs"):
  1. TPI at 500 m on the Basodino tile (parity-checked vs scipy)
  2. compute_gradient WE/SN/slope/aspect at 200 and 2000 m
  3. std + TPI multi-scale batch (fused disk_descriptors path)
  4. Sx azimuth sweep 0-350 deg at radii 200 / 2000 m
  5. continental-scale grids (4k^2 / 8k^2) single-chip + Pallas

Writes BENCH_DETAILS.md. Amortized hard-sync timing (see bench.py).
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def amort(fn, arg, iters=20, warmup=2, repeats=3):
    import jax.numpy as jnp

    for _ in range(warmup):
        # scalar-reduction sync: a full-field np.asarray fetch through the
        # relay can take minutes and is not part of the measured op
        float(jnp.sum(jax.tree_util.tree_leaves(fn(arg))[0]))
    rates = []
    for _ in range(repeats):  # min over repeats: relay hiccups (~hundreds of
        t0 = time.perf_counter()  # ms, rare) otherwise dominate a single pass
        results = [fn(arg) for _ in range(iters)]
        float(jnp.sum(jax.tree_util.tree_leaves(results[-1])[0]))
        rates.append((time.perf_counter() - t0) / iters)
    return min(rates)


import jax  # noqa: E402


def main():
    global jax
    import jax.numpy as jnp
    from scipy import signal

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from topo_descriptors_tpu import kernels, ops
    from topo_descriptors_tpu.geo import round_up_to_odd
    from topo_descriptors_tpu.io.synthetic import basodino_like_dem, synthetic_dem
    from topo_descriptors_tpu.kernels.sx_geometry import sx_offsets, sx_sweep_offsets

    lines = [
        "# Benchmark details (TPU v5e, amortized hard-sync timing)",
        "",
        f"Device: {jax.devices()[0]}",
        "",
        "| Config | Result |",
        "|---|---|",
    ]

    def flush():
        # incremental write: a timeout mid-run still leaves a valid table
        with open("BENCH_DETAILS.md", "w") as f:
            f.write("\n".join(lines + _footer()) + "\n")
    raster = basodino_like_dem(projected=True)
    dem_np = raster.data
    dem = jnp.asarray(dem_np)
    mpix = dem_np.size / 1e6

    # 1. TPI-500m parity + perf
    size = int(round_up_to_odd(500 / 30.0))
    out = np.asarray(jax.jit(lambda x: ops.tpi(x, size))(dem))
    k = kernels.circular_kernel(size, exclude_center=True)
    ref = dem_np - signal.convolve(dem_np, k, "same") / k.sum()
    err = float(np.abs(out - ref).max())
    t = amort(jax.jit(lambda x: ops.tpi(x, size)), dem)
    lines.append(
        f"| TPI 500 m, Basodino tile | {t*1e3:.2f} ms ({mpix/t:.0f} Mpix/s), "
        f"max err vs scipy {err:.2e} |"
    )
    print(lines[-1], flush=True)
    flush()

    # 2. gradient at 200 / 2000 m
    res = {"x": np.full(1440, 30.0, np.float32), "y": np.full(900, -30.0, np.float32)}
    for scale in (200, 2000):
        sigma = float(round_up_to_odd(scale / 30.0) / 4.0)
        t = amort(jax.jit(lambda x, s=sigma: ops.gradient(x, s, res, 1.0)), dem)
        lines.append(
            f"| gradient (4 outputs) {scale} m | {t*1e3:.2f} ms "
            f"({mpix/t:.0f} Mpix/s) |"
        )
        print(lines[-1], flush=True)
        flush()

    # 3. std + TPI multi-scale batch (fused)
    sizes = tuple(int(s) for s in round_up_to_odd(np.array([200, 500, 2000]) / 30.0))
    t = amort(jax.jit(lambda x: ops.disk_descriptors(x, sizes)), dem)
    per = t / (2 * len(sizes))
    lines.append(
        f"| fused TPI+STD batch, scales 200/500/2000 m | {t*1e3:.2f} ms total "
        f"= {per*1e3:.2f} ms per descriptor-scale ({mpix/per:.0f} Mpix/s each) |"
    )
    print(lines[-1], flush=True)
    flush()

    # 4. Sx azimuth sweeps (the op dedups ray tables internally: exact,
    #    kernels/sx_geometry.sx_dedupe)
    from topo_descriptors_tpu.kernels.sx_geometry import sx_sweep_dedupe

    azimuths = list(np.arange(0.0, 360.0, 10.0))
    for radius in (200.0, 2000.0):
        offsets, distances, border = sx_sweep_offsets(azimuths, radius, 30.0, 30.0)
        kded = sx_sweep_dedupe(offsets, distances)[0].shape[1]
        t = amort(
            jax.jit(lambda x, o=offsets, d=distances, b=border: ops.sx_sweep(x, o, d, b)),
            dem, iters=5,
        )
        per = t / len(azimuths)
        lines.append(
            f"| Sx sweep 36 azimuths, r={radius:.0f} m "
            f"({offsets.shape[1]} ray px, {kded} deduped) | "
            f"{t*1e3:.1f} ms total = {per*1e3:.2f} ms/azimuth "
            f"({mpix/per:.0f} Mpix/s each) |"
        )
        print(lines[-1], flush=True)
        flush()

    # 5. valley/ridge at 2 km (static bank, MXU) and 20 km (streamed FFT)
    from topo_descriptors_tpu.ops.valley_ridge import (
        bank_nbytes,
        valley_ridge_streamed,
    )
    from topo_descriptors_tpu.utils.profiling import Roofline

    from topo_descriptors_tpu.config import CFG

    from topo_descriptors_tpu.kernels.valley import rotated_extent

    roof = Roofline()
    for scale_m, iters in ((2000.0, 3), (20000.0, 1)):
        vsize = int(round_up_to_odd(scale_m / 30.0))
        # route exactly like valley_ridge(method='auto') so the label and
        # roofline model always match the path the op actually executes
        streamed = bank_nbytes(vsize, 3) > CFG.valley_bank_max_bytes
        kyx = max(rotated_extent(vsize, np.arange(180)))
        cached = streamed and 46 * 3 * kyx**2 * 4 <= CFG.valley_canvas_cache_bytes
        label = (
            "on-device rotation, canvas-cached, matmul-DFT" if cached
            else (
                "on-device rotation, matmul-DFT" if streamed
                else "scipy bank, matmul-DFT"
            )
        )

        # both paths manage their own jits; sync on scalars (both outputs)
        # so the timing measures compute, not a full-field fetch through
        # the relay, and no work escapes the timed window
        def vrun():
            if streamed:
                outs = valley_ridge_streamed(dem, vsize, "valley")
            else:
                outs = ops.valley_ridge(dem, vsize, "valley")
            float(jnp.sum(outs[0]))
            float(jnp.sum(outs[1]))

        vrun()  # compile + populate the device bank cache
        t0 = time.perf_counter()
        for _ in range(iters):
            vrun()
        t = (time.perf_counter() - t0) / iters
        ls = roof.valley_ridge_light_speed_ms(
            *dem_np.shape, vsize,
            method=(
                "mm_cached" if cached
                else ("mm_stream" if streamed else "mm_bank")
            ),
        ) / 1e3
        lines.append(
            f"| valley/ridge 180 angles, {scale_m/1000:.0f} km "
            f"(size {vsize}, {label}) | {t:.2f} s ({mpix/t:.1f} Mpix/s); "
            f"roofline {ls:.2f} s -> {ls/t*100:.0f}% of ceiling |"
        )
        print(lines[-1], flush=True)
        flush()

    # 6. continental scale (deduped ray table: ops.sx does it internally;
    #    dedupe here too so the roofline model sees the true ray count)
    from topo_descriptors_tpu.kernels.sx_geometry import sx_dedupe

    o5, d5, b5 = sx_offsets(0.0, 500.0, 30.0, 30.0)
    o5, d5 = sx_dedupe(o5, d5)
    with np.errstate(divide="ignore"):
        n_groups = len(set((1.0 / d5).astype(np.float32).tolist()))
    for n in (4096, 8192):
        big = jnp.asarray(synthetic_dem(n, n, seed=2))
        bmp = n * n / 1e6
        t_tpi = amort(jax.jit(lambda x: ops.tpi(x, 67)), big, iters=8)
        t_sx = amort(
            jax.jit(lambda x: ops.sx(x, o5, d5, b5, method="pallas")), big, iters=8
        )
        ls_sx = roof.sx_light_speed_ms(n * n, len(d5), n_groups)
        lines.append(
            f"| {n}x{n} ({bmp:.0f} Mpix): TPI-2000m / Sx-500m (Pallas) | "
            f"{t_tpi*1e3:.1f} ms ({bmp/t_tpi:.0f} Mpix/s) / "
            f"{t_sx*1e3:.1f} ms ({bmp/t_sx:.0f} Mpix/s, grouped-VPU roofline "
            f"{ls_sx:.1f} ms -> {ls_sx/(t_sx*1e3)*100:.0f}%) |"
        )
        print(lines[-1], flush=True)
        flush()

    # 7. Gpix out-of-core rows: measured by bench_gpix.py (tens of
    #    minutes; persisted so regeneration keeps the evidence)
    try:
        with open("BENCH_GPIX.txt") as f:
            gpix_lines = [ln.strip() for ln in f if ln.strip()]
        header = gpix_lines[0] if gpix_lines else "Gpix streamed run"
        for ln in gpix_lines[1:]:
            if ":" in ln:
                lines.append(f"| {header}: {ln.split(':', 1)[0]} | "
                             f"{ln.split(':', 1)[1].strip()} |")
            else:
                lines.append(f"| {header} | {ln} |")
    except FileNotFoundError:
        pass

    # 8. 100 km row(s): measured by bench_valley.py --full/--only-full
    #    (minutes-long; persisted so regeneration keeps the evidence)
    try:
        with open("BENCH_VALLEY_FULL.txt") as f:
            full_lines = [ln.strip() for ln in f if ln.strip()]
        for ln in full_lines[-3:]:
            lines.append(f"| {ln.split(':', 1)[0]} (bench_valley.py) | "
                         f"{ln.split(':', 1)[1].strip()} |")
    except FileNotFoundError:
        pass

    with open("BENCH_DETAILS.md", "w") as f:
        f.write("\n".join(lines + _footer()) + "\n")
    print("wrote BENCH_DETAILS.md", file=sys.stderr)

    try:  # doc build step: re-render figure spans from the fresh table
        import render_docs

        render_docs.refresh()
    except Exception as exc:  # pragma: no cover - docs are best-effort here
        print(f"doc refresh skipped: {exc}", file=sys.stderr)


def _footer():
    return [
        "",
        "Reference CPU baselines (BASELINE.md): TPI ~1.3 Mpix/s, "
        "Sx ~0.22 Mpix/s, gradient/std <1 s per scale on the 1.3 Mpix tile.",
        "",
        "Valley/ridge engine (round 4): convolutions run as partial-DFT "
        "matmuls on the MXU (ops/dft_conv.py — forward transforms only over "
        "the kernel support, inverse only over the 'same' window, aliased "
        "circular lengths ~h+k/2); kernels come from the scipy-exact host "
        "bank (<= CFG.valley_bank_max_bytes, device-cached) or on-device "
        "quadrant rotation (46 spline-gather rotations + exact flips/rot90s "
        "serve all 180 angles). **Fused Pallas bank-conv verdict: NO-GO** — "
        "an im2col patch buffer for a 95x95-tap MXU conv needs ~590 MB of "
        "VMEM per (128,128) tile (vs ~16 MB available), tiling it re-derives "
        "what XLA's conv emitter already does, and the matmul-DFT engine "
        "reaches ~85% of its own MXU roofline at 2 km — there is no headroom "
        "left that a hand-written kernel could claim.",
        "",
        "Valley/ridge round-5 additions: scan steps batch 2 quadrant "
        "angles (46 = 2x23 steps), and the rotated+folded canvas stack is "
        "cached on device per (size, mode, flats) signature up to "
        "CFG.valley_canvas_cache_bytes (rotation is input-independent; "
        "banded drivers and warm services pay the ~46 XLA gather rotations "
        "once — 20 km warm 1.78 -> 0.56-0.84 s across runs). The 100 km "
        "stack (~12 GB) exceeds the cache budget and keeps the per-call "
        "inline rotation; its first-call cost is relay-variance-dominated "
        "(see the 100 km row).",
        "",
        "Sx sweep routing + r=2000 verdict (round 5, measured on chip): "
        "ray tables are deduplicated exactly (sx_dedupe; the reference's "
        "arcs are 2-7x redundant) and 'auto' wide fans use the one-program "
        "XLA scan with unroll=8. At r=2000 m / 36 az the deduped scan runs "
        "2.9-3.2 ms/azimuth — ~100% of its own HBM floor (464 rays x one "
        "full-field slice pass = 2.4 GB -> 2.9 ms at 819 GB/s), so the "
        "round-2 <= 2.2 ms/az target is BELOW the streaming formulation's "
        "memory roofline. The block-resident Pallas routes, VMEM-resident "
        "and nominally compute-bound at ~0.6 ms/az, measure 4.9-6.2 "
        "ms/azimuth across every compile-viable block shape (chunked "
        "(256,512), single-program (128,256)/(64,512), and the grouped "
        "fan kernel): Mosaic keeps every static window slice of a program "
        "live (spill = K x block_bytes regardless of reduction shape; "
        "K=240 chunks on (256,512) blocks fail VMEM outright — hence the "
        "round-5 CHUNK_RAYS=120 / auto_block K<=128 limits) and charges "
        "~3 vector ops per misaligned slice, so the 1-op/ray model is "
        "unreachable. Verdict: target not met; binding constraints are "
        "the scan's HBM slice floor and Mosaic's slice-liveness + "
        "misaligned-load costs. Pallas wins only where it always did: "
        "production grids (4096^2+) where the scan's K full-field passes "
        "dwarf one-window-DMA traffic.",
        "",
        "Sx Pallas breakdown at 8192^2 / K=32 (bench_sx_profile.py, round "
        "5): full 13.4 ms = reduction ~6.4 ms (22% of the 1-op/ray "
        "grouped-VPU model — misaligned VMEM slices cost ~3 vector ops "
        "each, so ~4.1 ms is the realistic shift-formulation ceiling) + "
        "window DMA ~0.7-0.9 ms + XLA-side pad/crop/checksum passes. "
        "Round 4's 'per-program grid overhead' attribution was WRONG: "
        "noop-kernel time is unchanged from 512 to 256 programs "
        "(~0.8 us/program marginal), and block-size sweeps (256,512) -> "
        "(512,512) -> (256,1024) move throughput <2%.",
        "",
        "Headline stability (round 5): the dispatch-amortized scan "
        "headline varies <6% across repeats within one process; across "
        "processes the relay's throughput phases move it +-9% around the "
        "median (measured geomean 2636 / 2882 / 3094 Mpixel/s in "
        "back-to-back bench.py runs of the same binary). Treat "
        "single-process records as one sample of that phase "
        "distribution.",
        "",
        "Multi-device: see bench_scaling.py (partition+halo overhead ~0 "
        "on a virtual mesh; real-chip weak scaling needs pod hardware).",
    ]


if __name__ == "__main__":
    main()
