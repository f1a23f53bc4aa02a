"""Sx (Winstral wind-shelter) horizon scan."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return dev.platform in ("tpu", "axon") or "tpu" in str(dev).lower()
    except RuntimeError:
        return False


def sx(
    dem: jax.Array,
    offsets: np.ndarray,
    distances: np.ndarray,
    border: int,
    height: float = 10.0,
    method: str = "auto",
    zero_border: bool = True,
) -> jax.Array:
    """Maximum elevation angle along the azimuth fan's ray pixels.

    Parity target: reference ``_sx_rolling`` (topo.py:928-953): for every
    interior pixel, gather the DEM along all Bresenham line pixels,
    ``elev = atan((dem_line - dem0 - height) / dist)`` in degrees, NaN-ignoring
    max; a border of width ``border`` stays 0.

    TPU restructure: the reference's per-pixel gather loop becomes K
    whole-array shifted fused-multiply-max passes over static offsets —
    a pure data-parallel reduction with *no* gathers. Two identities make
    this cheap:

    * ``atan`` is monotonic, so ``max(atan(r_k)) == atan(max(r_k))`` — one
      transcendental per pixel instead of K;
    * NaN distances (radius_min exclusions, reference topo.py:845) map to
      NaN ratios, which ``fmax`` skips exactly like the reference's
      ``np.nanmax``.

    Parameters come from :func:`topo_descriptors_tpu.kernels.sx_offsets`.

    Quirk parity: for even window sizes the reference's distance window is
    centred one pixel off the ray convergence point (floor(w_float/2) vs
    floor(w_int/2), topo.py:869-871 vs 848), leaving a ray pixel at distance
    0; its candidates are atan(z/0) = +/-90 deg (or skipped when z == 0).
    The infinities here reproduce that: (z)*(1/0)=+/-inf -> +/-90, and
    0*inf = NaN is dropped by fmax exactly like the reference's nanmax.

    The offset table is deduplicated first
    (:func:`~topo_descriptors_tpu.kernels.sx_geometry.sx_dedupe` — exact:
    duplicates carry identical candidates and the max is idempotent), which
    shrinks the reference's fan tables 2-7x at 30 m resolution.

    Backends (``method``): ``'xla'`` — scan of K dynamic slices (the only
    backend off-TPU); ``'pallas'`` — the block-resident Mosaic kernel
    (ops/pallas/sx_block.py), which reads each halo window from HBM once
    instead of streaming the array per offset, with a block shape picked by
    ray count (``sx_block.auto_block`` — Mosaic keeps every window slice of
    a program live, so large fans take small blocks and chunked programs).
    ``'auto'`` on TPU (round-5 measured routing): Pallas when the deduped
    fan fits one fast-block program (K <= 128 — it wins or ties at every
    grid size there: the unroll=8 deduped scan has closed round 3's 4.6
    vs 76.8 ms gap at 4096^2 / r=500 m to a tie at ~5 ms, and Pallas's
    one-window-DMA traffic still bounds it below the scan's K full-field
    passes as K grows) or when the grid is large enough to amortize its
    fixed pad/epilogue/program costs (>= ~8 Mpix); otherwise the deduped
    XLA scan — at Basodino-size grids with r=2000 m fans the scan runs at
    its HBM slice floor (~3 ms) while every compile-viable Pallas shape
    measures 4.9-6.2 ms (see the Sx verdict in BENCH_DETAILS.md).
    """
    from topo_descriptors_tpu.kernels.sx_geometry import sx_dedupe

    offsets, distances = sx_dedupe(offsets, distances)
    h, w = dem.shape
    if method == "auto":
        if not _on_tpu():
            method = "xla"
        elif len(offsets) <= 128 or h * w >= 8 << 20:
            method = "pallas"
        else:
            method = "xla"
    if method == "pallas":
        from topo_descriptors_tpu.config import ensure_compilation_cache
        from topo_descriptors_tpu.ops.pallas.sx_block import sx_pallas

        ensure_compilation_cache()
        return sx_pallas(dem, offsets, distances, border, height,
                         zero_border=zero_border)
    offsets = np.asarray(offsets)
    with np.errstate(divide="ignore"):  # distance-0 quirk pixels, see above
        inv_dist = (1.0 / np.asarray(distances)).astype(np.float32)

    pad = int(border)
    padded = jnp.pad(dem, pad, mode="constant", constant_values=np.nan)

    base = dem + jnp.asarray(height, dtype=dem.dtype)
    neg_inf = jnp.full((h, w), -jnp.inf, dtype=dem.dtype)

    offs = jnp.asarray(offsets + pad, dtype=jnp.int32)  # slice starts, >= 0
    invs = jnp.asarray(inv_dist, dtype=dem.dtype)

    def step(carry, inputs):
        start, inv = inputs
        shifted = jax.lax.dynamic_slice(padded, (start[0], start[1]), (h, w))
        ratio = (shifted - base) * inv
        return jnp.fmax(carry, ratio), None

    # unroll=8: ~7% on wide fans (measured r=2000; the scan runs at ~100%
    # of its HBM slice-streaming floor, K x one (H, W) pass — see the Sx
    # sweep verdict in BENCH_DETAILS.md)
    max_ratio, _ = jax.lax.scan(step, neg_inf, (offs, invs), unroll=8)

    sx_deg = jnp.degrees(jnp.arctan(max_ratio))
    # no valid candidate at all (NaN centre pixel, or radius_min masked every
    # ray pixel) -> reference np.nanmax yields NaN (topo.py:951)
    sx_deg = jnp.where(jnp.isneginf(max_ratio), jnp.nan, sx_deg)

    if not zero_border:  # tiled path masks at the global frame instead
        return sx_deg.astype(dem.dtype)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (
        (yy >= pad) & (yy < h - pad) & (xx >= pad) & (xx < w - pad)
    )
    return jnp.where(interior, sx_deg, 0.0).astype(dem.dtype)


def _sweep_auto_method(n_az: int, kmax: int, on_tpu: bool) -> str:
    """Backend choice for :func:`sx_sweep` — see its docstring for the
    measured numbers behind each branch.

    Small fans take the per-azimuth constant-offset kernels (fastest warm,
    and <= 4 Mosaic compiles cold); wide fans take the one-program XLA scan
    — each Mosaic compile costs 17-25 s through the remote-compile relay,
    is not persisted by JAX's compilation cache, and static multi-azimuth
    programs (sx_fan_pallas) compile super-linearly in total rays, so no
    constant-offset formulation is viable cold at 36 azimuths. The Pallas
    routes stay available by name for warm, long-running services."""
    if not on_tpu:
        return "xla"
    if n_az <= 4:
        return "pallas"
    return "xla"


def sx_sweep(
    dem: jax.Array,
    offsets: np.ndarray,
    distances: np.ndarray,
    border: int,
    height: float = 10.0,
    method: str = "auto",
    zero_border: bool = True,
) -> jax.Array:
    """Sx for a whole fan of azimuths in one device program -> (A, H, W).

    The reference loops ``compute_sx`` per azimuth from the host, re-reading
    the DEM each time (an azimuth sweep 0-350 deg is 36 independent runs).
    Here all azimuths share one device program. On TPU each azimuth runs the
    block-resident Pallas kernel (its padding rows stripped host-side — the
    rectangular table pads rays to the widest azimuth); off-TPU a ``lax.map``
    scans the shared NaN-padded DEM with NaN-distance padding that the fmax
    reduction ignores by construction.

    ``offsets`` is (A, Kmax, 2) int32, ``distances`` (A, Kmax) with NaN
    padding; build both with
    :func:`topo_descriptors_tpu.kernels.sx_geometry.sx_sweep_offsets`.

    Backends (``method``): ``'xla'`` — lax.map over azimuths of the K-offset
    scan (one program per fan); ``'pallas_fan'`` — the static-table fan
    kernel (ops/pallas/sx_block.py `sx_fan_pallas`): azimuth tables baked
    as constants, azimuths grouped so each Mosaic program holds <=
    FAN_RAY_BUDGET rays, each block's halo window DMA'd once per group for
    all its azimuths; ``'pallas'`` — per-azimuth :func:`sx_pallas` calls
    (one Mosaic compile *per azimuth*); ``'pallas_sweep'`` — the CSR
    whole-fan kernel (ray tables in SMEM as runtime data — one program for
    ANY fan, but its dynamic shifts cost ~3-4x at runtime).

    All fan tables are deduplicated first (sx_sweep_dedupe — exact, the
    reference's arcs are massively redundant: 240 -> 32 rays at r=500 m,
    986 -> 464 at r=2000 m on 30 m grids).

    ``'auto'`` on TPU routes small fans (<= 4 azimuths) to the per-azimuth
    kernels and wide fans to the one-program XLA scan. The governing
    measurement (round 4): a Mosaic compile costs 17-25 s through the
    remote-compile relay, is NOT persisted by JAX's compilation cache, and
    multi-azimuth static-table programs compile super-linearly in total ray
    count — so every constant-offset formulation pays minutes cold on a
    wide fan, while the XLA scan compiles once per fan and, on deduped
    tables, runs within a few x of the Pallas kernels' throughput. Pin
    ``method='pallas'``/``'pallas_fan'`` for long-running services where
    the per-geometry compiles amortize away; measured numbers live in
    BENCH_DETAILS.md.
    """
    from topo_descriptors_tpu.kernels.sx_geometry import sx_sweep_dedupe

    offsets, distances = sx_sweep_dedupe(offsets, distances)
    h, w = dem.shape
    if method == "auto":
        n_az, kmax = np.asarray(offsets).shape[:2]
        method = _sweep_auto_method(n_az, kmax, _on_tpu())
    if method == "pallas_fan":
        from topo_descriptors_tpu.config import ensure_compilation_cache
        from topo_descriptors_tpu.ops.pallas.sx_block import sx_fan_pallas

        ensure_compilation_cache()
        return sx_fan_pallas(dem, offsets, distances, border, height,
                             zero_border=zero_border)
    if method == "pallas_sweep":
        from topo_descriptors_tpu.ops.pallas.sx_block import sx_sweep_pallas

        return sx_sweep_pallas(dem, offsets, distances, border, height,
                               zero_border=zero_border)
    if method == "pallas":
        from topo_descriptors_tpu.config import ensure_compilation_cache
        from topo_descriptors_tpu.ops.pallas.sx_block import sx_pallas

        ensure_compilation_cache()
        offsets_np = np.asarray(offsets)
        dists_np = np.asarray(distances)
        outs = []
        for a in range(offsets_np.shape[0]):
            # strip trailing pad rows: zero offset + NaN distance (genuine
            # radius_min NaNs sit mid-table and never have a (0,0) offset —
            # the centre pixel is excluded from every ray, topo.py:921-923)
            k = dists_np.shape[1]
            while (
                k > 0
                and np.isnan(dists_np[a, k - 1])
                and not offsets_np[a, k - 1].any()
            ):
                k -= 1
            outs.append(
                sx_pallas(dem, offsets_np[a, :k], dists_np[a, :k], border,
                          height, zero_border=zero_border)
            )
        return jnp.stack(outs)
    pad = int(border)
    padded = jnp.pad(dem, pad, mode="constant", constant_values=np.nan)
    base = dem + jnp.asarray(height, dtype=dem.dtype)
    neg_inf = jnp.full((h, w), -jnp.inf, dtype=dem.dtype)

    offs = jnp.asarray(np.asarray(offsets) + pad, dtype=jnp.int32)
    with np.errstate(divide="ignore"):  # distance-0 quirk pixels, see sx()
        invs = jnp.asarray(
            (1.0 / np.asarray(distances)).astype(np.float32), dtype=dem.dtype
        )

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= pad) & (yy < h - pad) & (xx >= pad) & (xx < w - pad)

    def one_azimuth(args):
        offs_a, invs_a = args

        def step(carry, inputs):
            start, inv = inputs
            shifted = jax.lax.dynamic_slice(padded, (start[0], start[1]), (h, w))
            return jnp.fmax(carry, (shifted - base) * inv), None

        max_ratio, _ = jax.lax.scan(
            step, neg_inf, (offs_a, invs_a), unroll=8
        )
        out = jnp.degrees(jnp.arctan(max_ratio))
        out = jnp.where(jnp.isneginf(max_ratio), jnp.nan, out)
        if not zero_border:  # tiled path masks at the global frame instead
            return out.astype(dem.dtype)
        return jnp.where(interior, out, 0.0).astype(dem.dtype)

    return jax.lax.map(one_azimuth, (offs, invs))
