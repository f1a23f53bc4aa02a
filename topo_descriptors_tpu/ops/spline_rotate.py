"""Dependency-free order-2 spline rotation, on device.

The reference rotates the valley/ridge kernel stack host-side with
``scipy.ndimage.rotate(order=2, reshape=True, mode='constant', cval=-9999)``
inside its 180-iteration angle loop (topo.py:441-443, 521-531). At its own
example scales (20-100 km at 30 m resolution) each rotated stack is hundreds
of MB, so a TPU pipeline that rotates host-side either bakes a 17-48 GB bank
into the program or ships ~48 GB of kernels over the wire per descriptor.
This module moves the rotation itself onto the device: the *base* kernel is
spline-prefiltered once, and each angle is a cheap gather-interpolation that
lives inside the same ``lax.scan`` as the convolution.

scipy parity (calibrated empirically, see tests/test_spline_rotate.py):

* **prefilter** — order-2 spline filter, single pole ``z = sqrt(8) - 3``,
  gain ``(1-z)(1-1/z)``, MIRROR boundary init (what scipy's
  ``spline_filter(mode='constant')`` resolves to). Because ``|z| ~ 0.17``,
  the causal/anticausal IIR recursions truncate to ``K``-tap FIRs with error
  ``|z|^K < 2e-11`` at K=14 — far below float32 eps — so the device runs
  pure shifted FMAs over the mirror-extended line, no sequential scan.
* **interpolation** — quadratic B-spline: footprint start
  ``floor(x + 0.5) - 1``, fraction ``t = x - start - 1``, weights
  ``(0.5 (0.5-t)^2, 0.75 - t^2, 0.5 (0.5+t)^2)``; footprint indices
  MIRROR-extended; the output is ``cval`` exactly where the *point*
  coordinate leaves ``[0, n-1]`` on either axis (rule reproduces
  ``scipy.ndimage.map_coordinates(mode='constant')`` to 2e-16 in float64).
* **reshape/anchor** — output shape ``int((|cos|+|sin|) * size + 0.5)`` per
  axis and center-to-center offset exactly as scipy's ``rotate``; the result
  is written straight into the common (ky_max, kx_max) canvas at the
  'same'-anchor offset used by
  :func:`~topo_descriptors_tpu.ops.valley_ridge.prepare_valley_bank`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_POLE = float(np.sqrt(8.0) - 3.0)
_GAIN = float((1.0 - _POLE) * (1.0 - 1.0 / _POLE))
_K_TAPS = 14  # |pole|^14 ~ 2e-11, below f32 eps


def exact_deg_trig(angle: float) -> Tuple[float, float]:
    """(cos, sin) of an angle in degrees, exact at multiples of 90.

    Mirrors scipy.special.cosdg/sindg at the points that decide rotated
    output shapes and anchors (the ``int(extent + 0.5)`` reshape rule is
    sensitive to exactness at 0/90/180/270)."""
    a = float(angle) % 360.0
    exact = {0.0: (1.0, 0.0), 90.0: (0.0, 1.0),
             180.0: (-1.0, 0.0), 270.0: (0.0, -1.0)}
    if a in exact:
        return exact[a]
    r = np.deg2rad(a)
    return float(np.cos(r)), float(np.sin(r))


def mirror_pad_1d(x: jax.Array, axis: int, lo: int, hi: int) -> jax.Array:
    """Mirror ('reflect' about the edge *sample*: d c b | a b c d | c b a)
    padding along one axis — the spline filter's boundary extension, distinct
    from :func:`~topo_descriptors_tpu.ops.conv.reflect_pad_1d`'s symmetric
    mode. Pad widths must be < axis length (always true here: K=14 taps vs
    kernel sizes >= 5)."""
    n = x.shape[axis]
    if lo >= n or hi >= n:
        raise ValueError(f"mirror pad ({lo}, {hi}) >= axis length {n}")
    parts = []
    if lo:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(1, lo + 1)
        parts.append(jnp.flip(x[tuple(sl)], axis=axis))
    parts.append(x)
    if hi:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(n - 1 - hi, n - 1)
        parts.append(jnp.flip(x[tuple(sl)], axis=axis))
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x


def _fir_valid(x: jax.Array, taps: np.ndarray, axis: int) -> jax.Array:
    """VALID 1-D correlation with host-side taps, unrolled into shifted
    FMAs (the K+1 = 15 taps here sit far below the conv engine's unroll
    threshold); works for any rank."""
    n = x.shape[axis]
    t = len(taps)
    n_out = n - t + 1
    acc = None
    for i in range(t):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n_out)
        term = x[tuple(sl)] * jnp.asarray(float(taps[i]), x.dtype)
        acc = term if acc is None else acc + term
    return acc


def _prefilter1d_o2(x: jax.Array, axis: int) -> jax.Array:
    """Order-2 spline prefilter along one axis (mirror boundary), as two
    K-tap FIR passes over the mirror-extended line."""
    # clamp the FIR truncation to the mirror period for tiny inputs; the
    # truncation error |z|^k stays below 1e-6 for any kernel >= 9 px (the
    # device path only ever runs at huge sizes, where k = 14 is exact to f32)
    k = min(_K_TAPS, x.shape[axis] - 1)
    xp = mirror_pad_1d(x * jnp.asarray(_GAIN, x.dtype), axis, k, k)
    # causal c[i] = sum_k z^k a[i-k]: valid-correlate with taps z^(K-t)
    causal_taps = np.array([_POLE ** (k - t) for t in range(k + 1)], np.float32)
    causal = _fir_valid(xp, causal_taps, axis)
    # causal now covers padded positions [0, n + k); anticausal needs the
    # k-sample lookahead: out[i] = sum_k -z^(k+1) c[i+k]
    anti_taps = np.array([-(_POLE ** (t + 1)) for t in range(k + 1)], np.float32)
    return _fir_valid(causal, anti_taps, axis)


def prefilter2d_o2(x: jax.Array) -> jax.Array:
    """Order-2 spline prefilter over the last two axes (scipy
    ``spline_filter(order=2, mode='constant')`` parity in float32)."""
    x = _prefilter1d_o2(x, x.ndim - 2)
    x = _prefilter1d_o2(x, x.ndim - 1)
    return x


def rotation_params(size: int, angle: float, ky_max: int, kx_max: int) -> np.ndarray:
    """Per-angle scalars for :func:`rotate_std_canvas` -> float32[8].

    Entries: cos, sin, offset_y, offset_x (scipy rotate's center-to-center
    offset), lo_y, lo_x (the 'same'-anchor placement inside the canvas),
    ky, kx (the true rotated extent)."""
    c, s = exact_deg_trig(angle)
    iy = ix = float(size)
    corners_y = np.array([0.0, 0.0, iy, iy])
    corners_x = np.array([0.0, ix, 0.0, ix])
    by = c * corners_y + s * corners_x
    bx = -s * corners_y + c * corners_x
    ky = int(np.ptp(by) + 0.5)
    kx = int(np.ptp(bx) + 0.5)
    out_c = np.array([(ky - 1) / 2.0, (kx - 1) / 2.0])
    off_y = (size - 1) / 2.0 - (c * out_c[0] + s * out_c[1])
    off_x = (size - 1) / 2.0 - (-s * out_c[0] + c * out_c[1])
    lo_y = (ky_max - 1) // 2 - (ky - 1) // 2
    lo_x = (kx_max - 1) // 2 - (kx - 1) // 2
    return np.array([c, s, off_y, off_x, lo_y, lo_x, ky, kx], np.float32)


def _mirror_idx(idx: jax.Array, n: int) -> jax.Array:
    """Single mirror reflection of footprint indices into [0, n-1]
    (footprints poke at most one sample past either edge)."""
    idx = jnp.where(idx < 0, -idx, idx)
    return jnp.where(idx > n - 1, 2 * (n - 1) - idx, idx)


def rotate_std_canvas(
    filtered: jax.Array,
    params: jax.Array,
    canvas_shape: Tuple[int, int],
) -> jax.Array:
    """Rotate a prefiltered (F, n, n) stack by one angle into the common
    anchored canvas, masked-re-standardized (reference topo.py:521-531).

    ``params`` is one row of :func:`rotation_params` (may be traced — one
    compiled program serves every angle of the bank). Pixels outside the
    rotated support are exactly 0 after standardization, and the canvas
    region beyond the angle's true (ky, kx) extent is 0 too, matching the
    host bank's anchored zero padding bit-for-bit in structure (values agree
    with the scipy construction to float32 rounding)."""
    n_flats, n, _ = filtered.shape
    ky_max, kx_max = canvas_shape
    c, s, off_y, off_x, lo_y, lo_x, ky, kx = (params[i] for i in range(8))

    oi = jax.lax.broadcasted_iota(jnp.float32, (ky_max, kx_max), 0) - lo_y
    oj = jax.lax.broadcasted_iota(jnp.float32, (ky_max, kx_max), 1) - lo_x
    ycoord = c * oi + s * oj + off_y
    xcoord = -s * oi + c * oj + off_x

    in_canvas = (oi >= 0) & (oi < ky) & (oj >= 0) & (oj < kx)
    nm1 = jnp.float32(n - 1)
    inside = (
        in_canvas
        & (ycoord >= 0) & (ycoord <= nm1)
        & (xcoord >= 0) & (xcoord <= nm1)
    )

    ystart = jnp.floor(ycoord + 0.5).astype(jnp.int32) - 1
    xstart = jnp.floor(xcoord + 0.5).astype(jnp.int32) - 1
    ty = ycoord - (ystart.astype(jnp.float32) + 1.0)
    tx = xcoord - (xstart.astype(jnp.float32) + 1.0)
    wy = (0.5 * (0.5 - ty) ** 2, 0.75 - ty * ty, 0.5 * (0.5 + ty) ** 2)
    wx = (0.5 * (0.5 - tx) ** 2, 0.75 - tx * tx, 0.5 * (0.5 + tx) ** 2)

    # clamp start for masked-out pixels so flat indices stay in range
    ystart = jnp.clip(ystart, -1, n - 2)
    xstart = jnp.clip(xstart, -1, n - 2)

    flat = filtered.reshape(n_flats, n * n)
    val = jnp.zeros((n_flats, ky_max, kx_max), filtered.dtype)
    for a in range(3):
        yi = _mirror_idx(ystart + a, n)
        for b in range(3):
            xi = _mirror_idx(xstart + b, n)
            idx = (yi * n + xi).reshape(-1)
            g = jnp.take(flat, idx, axis=1).reshape(n_flats, ky_max, kx_max)
            val = val + (wy[a] * wx[b])[None] * g

    # masked re-standardization over the valid support, then zero-fill
    # (plain-arithmetic equivalent of the reference's numpy.ma recipe)
    m = inside[None]
    cnt = jnp.sum(inside.astype(filtered.dtype))
    mean = jnp.sum(jnp.where(m, val, 0), axis=(1, 2), keepdims=True) / cnt
    anom = jnp.where(m, val - mean, 0)
    var = jnp.sum(anom * anom, axis=(1, 2), keepdims=True) / cnt
    return anom * jax.lax.rsqrt(var)
