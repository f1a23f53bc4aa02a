"""Disk ('same'-mode {0,1}-kernel) convolution as a block-resident Pallas
kernel using in-VMEM prefix sums.

The XLA prefix-sum path (ops/conv.py `_conv2d_sat`) is HBM-bound: the row
cumsum plus ~size full-width row adds re-stream the field many times. This
kernel is the memory-optimal form of the same algorithm (reference disk
semantics: topo.py:191-213, used by TPI topo.py:175 and STD topo.py:301-302):

* each program DMAs its (BY+kh-1, BX+kw)-halo window from the zero-padded
  field in HBM into VMEM **once**;
* a Hillis-Steele log-shift pass builds the row prefix sums in VMEM;
* every run ``[a, b]`` of ones in kernel row ``r`` contributes
  ``P[y+r, x+b+1] - P[y+r, x+a]`` — rows sharing the same ``(a, b)`` are
  summed before the two column slices (static VMEM slices, planned at
  compile time by Mosaic);
* HBM traffic is one halo-window read + one block write, ~1.5x the field
  size total, versus ~100x for the fused-XLA formulation.

Batched fields (TPI's single centred field, STD's three moment fields) share
the window DMA loop via a leading grid dimension.
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


def sat_block_and_window(
    kshape: tuple, h_out: int, w_out: int, block: tuple = (256, 512)
) -> tuple:
    """The (block, window) geometry :func:`disk_conv_sat_pallas` will use.

    Shared with the routing heuristic in ``ops.conv._conv2d_sat`` so the
    VMEM-fit estimate and the kernel can never disagree: the block shrinks
    to the (tile-rounded) output extent for small fields, and the halo
    window is the block plus kernel extent, tile-aligned (8, 128) with one
    sentinel column for the prefix-sum read at ``x + a`` with ``a = 0``.
    """
    kh, kw = kshape
    by, bx = block
    by = min(by, max(8, -(-h_out // 8) * 8))
    bx = min(bx, max(128, -(-w_out // 128) * 128))
    wy = -((-(by + kh - 1)) // 8) * 8
    wx = -((-(bx + kw)) // 128) * 128
    return (by, bx), (wy, wx)


def _sat_kernel(
    src_ref,  # zero-padded (B, Hp, Wp) field stack, HBM/ANY
    out_ref,  # (BY, BX) VMEM output block
    scratch,  # (wy, wx) VMEM halo window
    sem,
    *,
    block: tuple,
    window_shape: tuple,
    col_groups: tuple,  # ((a, b, (r0, r1, ...)), ...) static run groups
):
    by, bx = block
    f = pl.program_id(0)  # field index
    i = pl.program_id(1)
    j = pl.program_id(2)

    wy, wx = window_shape
    copy = pltpu.make_async_copy(
        src_ref.at[f, pl.ds(i * by, wy), pl.ds(j * bx, wx)],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    # row prefix sums in VMEM: Hillis-Steele log-shift
    p = scratch[:]
    shift = 1
    while shift < wx:
        z = jnp.zeros((wy, shift), jnp.float32)
        p = p + jnp.concatenate([z, p[:, : wx - shift]], axis=1)
        shift *= 2

    acc = None
    for a, b, rows in col_groups:
        rs = None
        for r in rows:
            sl = p[r : r + by, :]
            rs = sl if rs is None else rs + sl
        term = rs[:, b + 1 : b + 1 + bx] - rs[:, a : a + bx]
        acc = term if acc is None else acc + term
    out_ref[0] = acc


def disk_conv_sat_pallas(
    xs: jax.Array,
    kshape: tuple,
    runs,
    pads,
    block: tuple = (256, 512),
) -> jax.Array:
    """True convolution of (B, H, W) fields with one {0,1} kernel given as
    row-runs of its *flipped* form (see ``ops.conv._binary_kernel_runs``).
    Zero boundary; ``pads = ((ly, hy), (lx, hx))`` selects 'same' (scipy
    anchoring, `_same_pads`) or 'valid' (all zero) output placement, exactly
    like ``ops.conv._conv2d_sat``.
    """
    b, h, w = xs.shape
    kh, kw = kshape
    (ly, hy), (lx, hx) = pads
    h_out = h + ly + hy - kh + 1
    w_out = w + lx + hx - kw + 1

    (by, bx), (wy, wx) = sat_block_and_window(kshape, h_out, w_out, block)
    gy, gx = _cdiv(h_out, by), _cdiv(w_out, bx)

    pad_y = (gy - 1) * by + wy - (h + ly)
    pad_x = (gx - 1) * bx + wx - (w + lx + 1)
    padded = jnp.pad(xs, ((0, 0), (ly, pad_y), (lx + 1, pad_x))).astype(
        jnp.float32
    )

    by_cols: dict = {}
    for r, a, bcol in runs:
        by_cols.setdefault((a, bcol), []).append(r)
    col_groups = tuple(
        (a, bcol, tuple(rows)) for (a, bcol), rows in sorted(by_cols.items())
    )

    kernel_fn = functools.partial(
        _sat_kernel,
        block=(by, bx),
        window_shape=(wy, wx),
        col_groups=col_groups,
    )
    out = pl.pallas_call(
        kernel_fn,
        grid=(b, gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, by, bx), lambda f, i, j: (f, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((wy, wx), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((b, gy * by, gx * bx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(padded)
    return out[:, :h_out, :w_out].astype(xs.dtype)
