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


def _sx_kernel(
    dem_ref,  # padded DEM, stays in HBM/ANY
    out_ref,  # (BY, BX) VMEM output block: max ratio
    scratch,  # (BY+2b, BX+2b) VMEM halo window
    sem,  # DMA semaphore
    *,
    border: int,
    block: tuple,
    window_shape: tuple,  # tile-aligned (wy, wx) >= (by+2b, bx+2b)
    offset_table: tuple,  # static ((oy, ox, inv_dist), ...) per ray pixel
    height: float,
):
    by, bx = block
    i = pl.program_id(0)
    j = pl.program_id(1)

    wy, wx = window_shape
    copy = pltpu.make_async_copy(
        dem_ref.at[pl.ds(i * by, wy), pl.ds(j * bx, wx)],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    window = scratch[:]
    center = window[border : border + by, border : border + bx]
    base = center + jnp.float32(height)

    acc = jnp.full((by, bx), -jnp.inf, jnp.float32)
    for oy, ox, inv in offset_table:
        shifted = window[oy : oy + by, ox : ox + bx]
        acc = jnp.fmax(acc, (shifted - base) * jnp.float32(inv))
    out_ref[:] = acc


def sx_pallas(
    dem: jax.Array,
    offsets: np.ndarray,
    distances: np.ndarray,
    border: int,
    height: float = 10.0,
    block: tuple = (256, 256),
    zero_border: bool = True,
) -> jax.Array:
    """Drop-in replacement for :func:`ops.sx` backed by the Pallas kernel."""
    h, w = dem.shape
    by, bx = block
    b = int(border)
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

    offsets = np.asarray(offsets)
    with np.errstate(divide="ignore"):  # distance-0 quirk (see ops.sx)
        inv = (1.0 / np.asarray(distances)).astype(np.float32)
    offset_table = tuple(
        (int(oy) + b, int(ox) + b, float(iv))
        for (oy, ox), iv in zip(offsets, inv)
    )

    kernel = functools.partial(
        _sx_kernel,
        border=b,
        block=(by, bx),
        window_shape=(wy, wx),
        offset_table=offset_table,
        height=float(height),
    )
    out = pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (by, bx), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((wy, wx), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((gy * by, gx * bx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(padded)

    acc = out[:h, :w]
    sx_deg = jnp.degrees(jnp.arctan(acc))
    sx_deg = jnp.where(jnp.isneginf(acc), jnp.nan, sx_deg)
    if not zero_border:
        return sx_deg.astype(dem.dtype)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= b) & (yy < h - b) & (xx >= b) & (xx < w - b)
    return jnp.where(interior, sx_deg, 0.0).astype(dem.dtype)
