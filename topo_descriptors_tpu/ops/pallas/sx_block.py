"""Sx horizon scan as a block-resident Pallas kernel.

Semantics identical to :func:`topo_descriptors_tpu.ops.sx` (reference
topo.py:928-953 via the shifted-max reformulation). Execution model:

* the grid is tiled into (BY, BX) output blocks;
* each program DMAs its (BY+2b, BX+2b) halo window — b is the ray border —
  from the NaN-padded DEM in HBM into VMEM **once**;
* all K ray offsets then reduce on-chip: ``acc = fmax(acc, (shifted - base)
  * inv_dist[k])``. The ray offsets are compile-time constants (host-side
  geometry), so every shifted view is a *static* VMEM slice — Mosaic plans
  the sublane/lane rotations at compile time; no dynamic indexing at all;
* one ``atan`` per pixel in the XLA epilogue (monotonicity hoists it out of
  the max; Mosaic has no atan lowering anyway).

On grids whose padded array exceeds VMEM, the XLA scan formulation streams
the full array from HBM once per offset (K x traffic); this kernel reads
each halo window once, making the op compute-bound at VPU roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _tree_fmax(vals, max_live: int = 0):
    """Balanced fmax reduction — log2(n) depth exposes VPU ILP that a
    serial fold hides (the serial chain is one long dependency).

    ``max_live`` > 0 bounds the reduction's fan-in: inputs are consumed in
    windows of that many values, each window tree-reduced and folded into a
    running maximum. A fully balanced tree over a large input list makes
    every leaf (a whole block-shaped value) simultaneously live, and
    Mosaic's register allocator spills — measured at r=2000 m (where
    distance groups reach dozens of rays on a (256, 512) block) the spill
    slots alone were 136 MB and the program failed VMEM outright. Windowed
    reduction keeps <= max_live+1 block values live while retaining
    in-window ILP."""
    if max_live and len(vals) > max_live:
        acc = None
        for i in range(0, len(vals), max_live):
            part = _tree_fmax(list(vals[i : i + max_live]))
            acc = part if acc is None else jnp.fmax(acc, part)
        return acc
    vals = list(vals)
    while len(vals) > 1:
        nxt = [
            jnp.fmax(vals[k], vals[k + 1])
            for k in range(0, len(vals) - 1, 2)
        ]
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    return vals[0]


def _sx_kernel(
    dem_ref,  # padded DEM, stays in HBM/ANY
    out_ref,  # (BY, BX) VMEM output block: max ratio
    scratch,  # (2, wy, wx) VMEM halo windows (double-buffered)
    sem,  # (2,) DMA semaphores
    *,
    border: int,
    block: tuple,
    window_shape: tuple,  # tile-aligned (wy, wx) >= (by+2b, bx+2b)
    dist_table: tuple,  # static ((inv_dist, ((oy, ox), ...)), ...) groups
    height: float,
    grid: tuple,
    n_acc: int,
):
    """Block-resident Sx, three VPU-level optimizations over the naive
    ``acc = fmax(acc, (shift_k - base) * inv_k)`` loop (together ~3x,
    measured 10.8 -> 3.4 ms at 4096^2 / K=240):

    * **distance grouping** — rays are grouped host-side by identical
      1/distance; within a group ``max_k (s_k - base) * inv == (max_k s_k
      - base) * inv`` (inv > 0; the inv=inf distance-0 quirk also commutes
      because a 0 * inf NaN is exactly the candidate fmax drops), so the
      subtract/multiply runs once per *group* instead of once per *ray*:
      ~3 ops/ray -> ~1 ops/ray + 3/group;
    * **multi-accumulator ILP** — ``n_acc`` independent running maxima
      break the serial fmax dependency chain across groups;
    * **double-buffered DMA** — each program prefetches the *next* block's
      halo window into the alternate buffer before reducing its own, hiding
      the HBM read behind ~K VPU passes over VMEM.
    """
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

    @pl.when(linear == 0)
    def _first():
        copy_for(linear, slot).start()

    @pl.when(linear + 1 < gy * gx)
    def _prefetch_next():
        copy_for(linear + 1, 1 - slot).start()

    copy_for(linear, slot).wait()
    window = scratch[slot]

    base = window[border : border + by, border : border + bx] + jnp.float32(
        height
    )
    accs = [jnp.full((by, bx), -jnp.inf, jnp.float32) for _ in range(n_acc)]
    for gi, (inv, group) in enumerate(dist_table):
        best = _tree_fmax(
            [window[oy : oy + by, ox : ox + bx] for oy, ox in group],
            max_live=8,
        )
        k = gi % n_acc
        accs[k] = jnp.fmax(accs[k], (best - base) * jnp.float32(inv))
    out_ref[:] = _tree_fmax(accs)


def _sx_sweep_kernel(
    colptr_ref,  # (A, C*8+1) int32 SMEM: CSR pointers per (column, oy%8)
    oy_ref,  # (A, Kmax) int32 SMEM: row offsets (border added), group-sorted
    inv_ref,  # (A, Kmax) f32 SMEM: 1/distance, group-sorted
    dem_ref,  # padded DEM, stays in HBM/ANY
    out_ref,  # (1, BY, BX) VMEM output block for azimuth a
    scratch,  # (2, wy, wx) VMEM halo windows (double-buffered across blocks)
    sem,  # (2,) DMA semaphores
    *,
    border: int,
    block: tuple,
    window_shape: tuple,
    height: float,
    grid: tuple,
    n_acc: int,
):
    """Whole-fan Sx: ray offsets as *runtime data* instead of constants.

    Unlike :func:`_sx_kernel` (offsets baked into the program — one Mosaic
    compile per azimuth geometry), this kernel reads the offset table from
    SMEM, so ONE compiled program serves every azimuth of the fan (and any
    fan of the same table shape). The grid is (gy, gx, A) with the azimuth
    dimension innermost: each block's halo window is DMA'd from HBM exactly
    once and stays VMEM resident while all A azimuths reduce over it.

    Mosaic only allows dynamic vector-load starts provably aligned to the
    (8, 128) tile, so a dynamic (oy, ox) shift cannot be a plain VMEM
    slice. The rays are therefore CSR-grouped host-side by
    ``(column, oy mod 8)``: the kernel walks the C x 8 groups in a static
    double loop (static lane slice + static sublane remainder), and inside a
    group only the *aligned* load base ``(oy // 8) * 8`` is dynamic —
    alignment Mosaic can prove — so every vector op runs at full
    (8, 128)-tile throughput with no per-ray branch. (The round-2 version
    grouped by column only and selected the remainder with an 8-way
    ``lax.switch`` per ray, which Mosaic lowers to compute-all-and-select —
    ~8x the VMEM reads; the static remainder removes it entirely.)
    ``n_acc`` independent accumulators rotate across groups to break the
    serial fmax dependency chain, and each block's window is prefetched
    while the previous block's last azimuth still reduces.
    """
    by, bx = block
    gy, gx = grid
    wy, wx = window_shape
    i = pl.program_id(0)
    j = pl.program_id(1)
    a = pl.program_id(2)
    n_az = pl.num_programs(2)
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

    @pl.when((linear == 0) & (a == 0))
    def _first():
        copy_for(linear, slot).start()

    # prefetch the next block's window while this block's last azimuth runs
    @pl.when((a == n_az - 1) & (linear + 1 < gy * gx))
    def _prefetch_next():
        copy_for(linear + 1, 1 - slot).start()

    @pl.when(a == 0)
    def _wait_window():
        copy_for(linear, slot).wait()

    base = scratch[slot, border : border + by, border : border + bx] + (
        jnp.float32(height)
    )

    accs = [jnp.full((by, bx), -jnp.inf, jnp.float32) for _ in range(n_acc)]
    n_cols = (colptr_ref.shape[1] - 1) // 8
    gi = 0
    for c in range(n_cols):
        for r in range(8):
            g = c * 8 + r

            def body(k, acc, c=c, r=r):
                oy = oy_ref[a, k]
                inv = inv_ref[a, k]
                # assert the 8-alignment so Mosaic emits a plain aligned
                # vector load instead of a per-sublane dynamic rotate
                oy_hi = pl.multiple_of((oy // 8) * 8, 8)
                tile = scratch[slot, pl.ds(oy_hi, by + 8), c : c + bx]
                shifted = tile[r : r + by, :]  # static sublane remainder
                return jnp.fmax(acc, (shifted - base) * inv)

            # empty group (no rays at this (column, residue)) -> zero trips
            k = gi % n_acc
            accs[k] = jax.lax.fori_loop(
                colptr_ref[a, g], colptr_ref[a, g + 1], body, accs[k]
            )
            gi += 1
    out_ref[0] = _tree_fmax(accs)


def _sx_fan_kernel(
    dem_ref,  # padded DEM, stays in HBM/ANY
    out_ref,  # (A_g, BY, BX) VMEM output block: max ratio per azimuth
    scratch,  # (2, wy, wx) VMEM halo windows (double-buffered)
    sem,  # (2,) DMA semaphores
    *,
    border: int,
    block: tuple,
    window_shape: tuple,
    tables: tuple,  # per azimuth: static ((inv, ((oy, ox), ...)), ...)
    height: float,
    grid: tuple,
    n_acc: int,
):
    """Whole-fan Sx with STATIC per-azimuth tables — one Mosaic program for
    a group of azimuths.

    The per-azimuth kernel (:func:`_sx_kernel`) costs one tunnel compile
    per azimuth geometry (measured 17-25 s each through the remote-compile
    relay — a 36-azimuth fan pays ~12 min cold, and Mosaic binaries do not
    persist in JAX's compilation cache). The CSR sweep kernel compiles once
    but pays runtime for its dynamic shifts. This kernel takes the third
    corner: the azimuth loop is *unrolled over static tables* inside one
    program, so every shifted view stays a compile-time VMEM slice at full
    tile throughput, and each block's halo window is DMA'd once for ALL
    azimuths in the group.

    Measured compile reality (round 4): Mosaic compile time through the
    relay grows SUPER-linearly with the unrolled instruction stream — the
    36-azimuth r=500 m fan (one program, ~1.3K deduped rays) did not
    compile within 10 minutes, so batching azimuths does not beat 36
    separate small programs cold. The fan kernel therefore stays an
    explicit opt-in (``method='pallas_fan'``) for contexts that keep one
    process alive and want the minimal per-window HBM traffic; ``'auto'``
    wide fans use the one-program XLA scan instead.
    """
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

    @pl.when(linear == 0)
    def _first():
        copy_for(linear, slot).start()

    copy_for(linear, slot).wait()

    # prefetch the next block's window while this block's azimuths reduce
    @pl.when(linear + 1 < gy * gx)
    def _prefetch_next():
        copy_for(linear + 1, 1 - slot).start()

    window = scratch[slot]
    base = window[border : border + by, border : border + bx] + jnp.float32(
        height
    )
    for a, dist_table in enumerate(tables):
        accs = [
            jnp.full((by, bx), -jnp.inf, jnp.float32)
            for _ in range(min(n_acc, len(dist_table)))
        ]
        for gi, (inv, group) in enumerate(dist_table):
            best = _tree_fmax(
                [window[oy : oy + by, ox : ox + bx] for oy, ox in group],
                max_live=8,
            )
            k = gi % len(accs)
            accs[k] = jnp.fmax(accs[k], (best - base) * jnp.float32(inv))
        out_ref[a] = _tree_fmax(accs)


# Total rays baked into ONE fan program. Bounds the Mosaic compile time
# (instruction stream ~ total rays, super-linear through the relay) AND the
# register-allocator live set: Mosaic keeps every static window slice of a
# program alive (measured round 5 — a 240-slice program on (256, 512)
# blocks allocates 240 x 0.5 MB of spill slots and fails VMEM, identical
# with any reduction shape), so rays_per_program x block_bytes must stay
# well under the 128 MB VMEM. At the fan kernel's (64, 256) block that is
# 64 KB/slice: 768 rays ~ 48 MB.
FAN_RAY_BUDGET = 768


def sx_fan_pallas(
    dem: jax.Array,
    offsets: np.ndarray,
    distances: np.ndarray,
    border: int,
    height: float = 10.0,
    block: tuple | None = None,
    zero_border: bool = True,
    n_acc: int = 8,
) -> jax.Array:
    """Sx for a fan of azimuths -> (A, H, W) via static-table fan programs.

    ``offsets`` (A, Kmax, 2) / ``distances`` (A, Kmax) from
    ``sx_sweep_offsets`` (pad rows allowed). Azimuths are greedily grouped
    so each Mosaic program holds <= FAN_RAY_BUDGET rays — the whole
    reference fan (36 azimuths) compiles as 1 program at r=500 m (deduped
    ~1.3K rays) and ~5 at r=2000 m (~16.7K), versus 36-72 for the
    per-azimuth route. Each block's halo window is read from HBM once per
    group for all its azimuths.
    """
    h, w = dem.shape
    offsets = np.asarray(offsets)
    distances = np.asarray(distances)
    n_az, kmax = offsets.shape[:2]
    b = int(border)
    with np.errstate(divide="ignore"):  # distance-0 quirk (see ops.sx)
        inv_all = (1.0 / distances).astype(np.float32)

    tables = []
    ray_counts = []
    for a in range(n_az):
        pad_rows = np.isnan(distances[a]) & ~offsets[a].any(axis=1)
        real = ~pad_rows
        groups: dict = {}
        for (oy, ox), iv in zip(offsets[a][real], inv_all[a][real]):
            groups.setdefault(float(iv), []).append(
                (int(oy) + b, int(ox) + b)
            )
        tables.append(
            tuple((iv, tuple(g)) for iv, g in sorted(groups.items()))
        )
        ray_counts.append(int(real.sum()))

    if block is None:
        # small blocks: the (A_g, by, bx) output lives whole in VMEM, so
        # per-azimuth output tiles must stay tiny; (64, 256) is the
        # validated no-spill shape for arbitrary ray counts (auto_block)
        block = (64, 256)
    by, bx = block
    gy, gx = _cdiv(h, by), _cdiv(w, bx)
    wy = -((-(by + 2 * b)) // 8) * 8
    wx = -((-(bx + 2 * b)) // 128) * 128
    pad_y = (gy - 1) * by + wy - (h + b)
    pad_x = (gx - 1) * bx + wx - (w + b)
    padded = jnp.pad(
        dem,
        ((b, pad_y), (b, pad_x)),
        mode="constant",
        constant_values=np.nan,
    ).astype(jnp.float32)

    # greedy azimuth groups bounded by the per-program ray budget and by
    # the VMEM footprint of the (A_g, by, bx) output block
    max_az = max(1, (6 << 20) // (by * bx * 4))
    az_groups, cur, cnt = [], [], 0
    for a in range(n_az):
        if cur and (cnt + ray_counts[a] > FAN_RAY_BUDGET
                    or len(cur) >= max_az):
            az_groups.append(cur)
            cur, cnt = [], 0
        cur.append(a)
        cnt += ray_counts[a]
    if cur:
        az_groups.append(cur)

    parts = []
    for azs in az_groups:
        kernel = functools.partial(
            _sx_fan_kernel,
            border=b,
            block=(by, bx),
            window_shape=(wy, wx),
            tables=tuple(tables[a] for a in azs),
            height=float(height),
            grid=(gy, gx),
            n_acc=n_acc,
        )
        out = pl.pallas_call(
            kernel,
            grid=(gy, gx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (len(azs), by, bx),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, wy, wx), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_shape=jax.ShapeDtypeStruct(
                (len(azs), gy * by, gx * bx), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                # the double-buffered prefetch assumes strictly sequential
                # grid order
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(padded)
        parts.append(out[:, :h, :w])
    acc = jnp.concatenate(parts, axis=0)

    sx_deg = jnp.degrees(jnp.arctan(acc))
    sx_deg = jnp.where(jnp.isneginf(acc), jnp.nan, sx_deg)
    if not zero_border:
        return sx_deg.astype(dem.dtype)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= b) & (yy < h - b) & (xx >= b) & (xx < w - b)
    return jnp.where(interior[None], sx_deg, 0.0).astype(dem.dtype)


def sx_sweep_pallas(
    dem: jax.Array,
    offsets: np.ndarray,
    distances: np.ndarray,
    border: int,
    height: float = 10.0,
    block: tuple = (256, 256),
    zero_border: bool = True,
) -> jax.Array:
    """Sx for a fan of azimuths -> (A, H, W), one block-resident program.

    ``offsets`` (A, Kmax, 2) / ``distances`` (A, Kmax) from
    :func:`topo_descriptors_tpu.kernels.sx_geometry.sx_sweep_offsets`.
    Replaces the reference's per-azimuth host loop over ``compute_sx``
    (topo.py:760) with a single device program whose halo windows are read
    from HBM once per block — the XLA scan formulation re-streams a full
    (H, W) slice per ray offset per azimuth, so at wide fans this kernel is
    ~A x lighter on HBM.

    Measured reality (v5e, 900x1440, 36 azimuths, round 3): HBM traffic is
    not the binding constraint at these sizes — the runtime-offset row
    shifts cost ~1 aligned dynamic-base VMEM load per ray plus ~1080
    mostly-empty scalar loops per (block, azimuth), and the kernel lands at
    4.71 / 19.3 ms per azimuth (r=500/2000 m) vs the XLA scan's 1.60 / 6.30
    and per-azimuth constant-offset :func:`sx_pallas`'s 0.56 / 5.9. It is
    therefore opt-in (``method='pallas_sweep'``); ``'auto'`` never routes
    here. Kept because it is the only formulation whose compile cost is
    fan-size-independent (one program for any fan) — the right trade on a
    cold compile cache with very wide fans.
    """
    h, w = dem.shape
    by, bx = block
    b = int(border)
    gy, gx = _cdiv(h, by), _cdiv(w, bx)

    # extra 8 rows so the aligned (oy//8*8, by+8) tile load stays in bounds
    # for every row offset oy <= 2*border
    wy = -((-(by + 2 * b)) // 8) * 8 + 8
    wx = -((-(bx + 2 * b)) // 128) * 128

    pad_y = (gy - 1) * by + wy - (h + b)
    pad_x = (gx - 1) * bx + wx - (w + b)
    padded = jnp.pad(
        dem,
        ((b, pad_y), (b, pad_x)),
        mode="constant",
        constant_values=np.nan,
    ).astype(jnp.float32)

    offsets = np.asarray(offsets)
    distances = np.asarray(distances)
    n_az, kmax = offsets.shape[:2]
    n_cols = 2 * b + 1
    with np.errstate(divide="ignore"):  # distance-0 quirk (see ops.sx)
        inv_all = (1.0 / distances).astype(np.float32)

    # CSR-group each azimuth's rays by (column offset, row offset mod 8) —
    # see kernel docstring: the static residue keeps the sublane shift free.
    # Padding rows (zero offset, NaN distance) are dropped here outright —
    # the CSR ranges only cover real rays, so ragged fans cost nothing.
    oy = np.zeros((n_az, kmax), np.int32)
    inv = np.full((n_az, kmax), np.nan, np.float32)
    colptr = np.zeros((n_az, n_cols * 8 + 1), np.int32)
    for a in range(n_az):
        real = ~(np.isnan(distances[a]) & ~offsets[a].any(axis=1))
        oy_a = offsets[a, real, 0] + b
        ox_a = offsets[a, real, 1] + b
        group = ox_a * 8 + (oy_a % 8)
        order = np.argsort(group, kind="stable")
        n_real = order.size
        oy[a, :n_real] = oy_a[order]
        inv[a, :n_real] = inv_all[a, real][order]
        colptr[a, 1:] = np.cumsum(np.bincount(group, minlength=n_cols * 8))

    kernel = functools.partial(
        _sx_sweep_kernel,
        border=b,
        block=(by, bx),
        window_shape=(wy, wx),
        height=float(height),
        grid=(gy, gx),
        n_acc=4,
    )
    out = pl.pallas_call(
        kernel,
        grid=(gy, gx, n_az),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, by, bx), lambda i, j, a: (a, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wy, wx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n_az, gy * by, gx * bx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # scratch persistence across the azimuth dim and the cross-block
            # prefetch require strictly sequential grid order
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(colptr, oy, inv, padded)

    acc = out[:, :h, :w]
    sx_deg = jnp.degrees(jnp.arctan(acc))
    sx_deg = jnp.where(jnp.isneginf(acc), jnp.nan, sx_deg)
    if not zero_border:
        return sx_deg.astype(dem.dtype)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= b) & (yy < h - b) & (xx >= b) & (xx < w - b)
    return jnp.where(interior[None], sx_deg, 0.0).astype(dem.dtype)


def auto_block(n_rays: int) -> tuple:
    """Block shape for :func:`sx_pallas`, chosen by ray count.

    The kernel unrolls all K shifted slices into one instruction stream,
    and Mosaic keeps every slice value live for the whole program (measured
    round 5: the spill-slot allocation equals K x block_bytes regardless of
    reduction fan-in), so the constraint is ``K x by x bx x 4 <~ 64 MB``
    (half the 128 MB VMEM, leaving room for scratch windows + output).
    (256, 512) blocks are fastest when they fit: 0.5 MB/slice -> K <= 128.
    Beyond that, (64, 256) blocks at 64 KB/slice carry up to ~1000 rays
    [historically measured: K=986 at (256, 512) spills 181 MB and fails;
    at (64, 256) it compiles in ~18 s and runs 5.9 ms]."""
    return (256, 512) if n_rays <= 128 else (64, 256)


# Largest ray count baked into ONE Mosaic program at the fast (256, 512)
# block shape: every slice stays live (see auto_block), so 120 x 0.5 MB =
# 60 MB of live slices fits VMEM with room for scratch + output. Larger
# fans are split into chunks of whole distance-groups, each its own small
# program, with the running maxima combined by one XLA fmax — compile cost
# stays O(K/CHUNK_RAYS) small programs instead of one VMEM-failing giant
# (measured round 5: a 240-ray (256, 512) program allocates 136 MB of
# spill slots and fails VMEM outright).
CHUNK_RAYS = 120


def _chunk_dist_table(dist_table, max_rays: int):
    """Partition distance-groups into chunks of <= max_rays rays (a single
    oversized group stays whole — auto_block then falls back to the small
    block for that chunk)."""
    chunks, cur, cnt = [], [], 0
    for entry in dist_table:
        n = len(entry[1])
        if cur and cnt + n > max_rays:
            chunks.append(tuple(cur))
            cur, cnt = [], 0
        cur.append(entry)
        cnt += n
    if cur:
        chunks.append(tuple(cur))
    return chunks


def _sx_pallas_acc(padded, dist_table, b, block, n_acc, height, h, w):
    """One Mosaic program over a pre-padded field for one chunk of
    distance-groups -> raw max-ratio plane (cropped to (h, w))."""
    by, bx = block
    gy, gx = _cdiv(h, by), _cdiv(w, bx)
    wy = -((-(by + 2 * b)) // 8) * 8
    wx = -((-(bx + 2 * b)) // 128) * 128
    kernel = functools.partial(
        _sx_kernel,
        border=b,
        block=(by, bx),
        window_shape=(wy, wx),
        dist_table=dist_table,
        height=float(height),
        grid=(gy, gx),
        n_acc=min(int(n_acc), len(dist_table)),
    )
    out = pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (by, bx), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wy, wx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((gy * by, gx * bx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # the double-buffered prefetch assumes strictly sequential
            # grid order
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(padded)
    return out[:h, :w]


def sx_pallas(
    dem: jax.Array,
    offsets: np.ndarray,
    distances: np.ndarray,
    border: int,
    height: float = 10.0,
    block: tuple | None = None,
    zero_border: bool = True,
    n_acc: int | None = None,
) -> jax.Array:
    """Drop-in replacement for :func:`ops.sx` backed by the Pallas kernel.

    Fans wider than :data:`CHUNK_RAYS` rays are split into chunks of whole
    distance-groups: each chunk compiles a small constant-offset program at
    the fast (256, 512) block shape, the raw maxima combine with one XLA
    ``fmax``, and the atan epilogue runs once — Mosaic's VMEM live-set cap
    (auto_block) is never hit, and the compile cost is a few small
    programs instead of one VMEM-failing giant. Measured v5e at the
    Basodino grid, r=2000 m deduped fan (K=464, 4 chunks of <= 120):
    4.9 ms/azimuth warm — slower than the deduped XLA scan (2.9-3.2
    ms/azimuth, which runs at ~100% of its HBM slice-streaming floor);
    the Pallas route's value is at production grid sizes (4096^2+) where
    the scan's K full-field HBM passes dwarf the block-resident kernel's
    one-window-DMA traffic. See the Sx sweep verdict in BENCH_DETAILS.md.
    """
    h, w = dem.shape
    offsets = np.asarray(offsets)
    with np.errstate(divide="ignore"):  # distance-0 quirk (see ops.sx)
        inv = (1.0 / np.asarray(distances)).astype(np.float32)
    b = int(border)
    # group rays by identical 1/distance (see kernel docstring); sorted for
    # a deterministic table -> stable jit cache keys
    groups: dict = {}
    for (oy, ox), iv in zip(offsets, inv):
        groups.setdefault(float(iv), []).append((int(oy) + b, int(ox) + b))
    dist_table = tuple(
        (iv, tuple(g)) for iv, g in sorted(groups.items())
    )
    n_rays = len(offsets)
    if block is None and n_rays > CHUNK_RAYS:
        chunks = _chunk_dist_table(dist_table, CHUNK_RAYS)
    else:
        chunks = [dist_table]
    max_chunk = max(sum(len(g) for _, g in c) for c in chunks)
    if block is None:
        block = auto_block(max_chunk)
    if n_acc is None:
        # small blocks leave register headroom for more parallel maxima
        # (measured at K=986/(64,256): n_acc=8 5.92 ms vs n_acc=4 6.22)
        n_acc = 4 if block[0] >= 128 else 8
    by, bx = block
    gy, gx = _cdiv(h, by), _cdiv(w, bx)

    # VMEM windows must be tile-aligned (8 sublanes x 128 lanes for f32):
    # round the halo window up and over-pad the source so every DMA slice
    # has the aligned shape.
    wy = -((-(by + 2 * b)) // 8) * 8
    wx = -((-(bx + 2 * b)) // 128) * 128

    # NaN-pad: ray halo on all sides plus bottom/right round-up to the tile
    # grid and the aligned window; NaN candidates are ignored by fmax, and
    # the rounded-up output region is cropped off afterwards.
    pad_y = (gy - 1) * by + wy - (h + b)
    pad_x = (gx - 1) * bx + wx - (w + b)
    padded = jnp.pad(
        dem,
        ((b, pad_y), (b, pad_x)),
        mode="constant",
        constant_values=np.nan,
    ).astype(jnp.float32)

    acc = None
    for chunk in chunks:
        part = _sx_pallas_acc(padded, chunk, b, block, n_acc, height, h, w)
        acc = part if acc is None else jnp.fmax(acc, part)

    sx_deg = jnp.degrees(jnp.arctan(acc))
    sx_deg = jnp.where(jnp.isneginf(acc), jnp.nan, sx_deg)
    if not zero_border:
        return sx_deg.astype(dem.dtype)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= b) & (yy < h - b) & (xx >= b) & (xx < w - b)
    return jnp.where(interior, sx_deg, 0.0).astype(dem.dtype)
