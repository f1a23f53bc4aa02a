"""Valley / ridge index over 180 rotated V/U-kernel orientations."""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from topo_descriptors_tpu.config import CFG
from topo_descriptors_tpu.kernels.valley import (
    ridge_kernels,
    rotate_kernels,
    rotated_extent,
    rotated_kernel_bank,
    valley_kernels,
)
from topo_descriptors_tpu.ops.conv import (
    _fft_shape,
    conv2d_bank_rowchan,
    gaussian_filter,
)


def bank_nbytes(size: int, n_flats: int, n_angles: int = 180) -> int:
    """float32 size of the full padded rotation bank, computed without
    building it. At the reference's own 60-100 km example scales
    (scripts/compute_topo_descriptors.py:63-72) this reaches 17-48 GB, which
    is why :func:`valley_ridge` switches to the streamed path above
    ``CFG.valley_bank_max_bytes``."""
    ky, kx = rotated_extent(size)
    return n_angles * n_flats * ky * kx * 4


def prepare_valley_bank(
    size: int,
    mode: str,
    flat_list: Sequence[float],
    angles: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Precompute the rotated kernel bank as one static (A, F, KY, KX) array.

    The per-angle rotations have varying spatial extent (reshape=True grows
    the support, reference topo.py:525); each is zero-padded to the common
    maximum with the padding split chosen so the scipy 'same' crop anchor
    ``(k-1)//2`` is preserved exactly — zero taps contribute nothing, so the
    padded bank is numerically identical to the ragged one.
    """
    if angles is None:
        angles = np.arange(0, 180, dtype=np.float32)
    bank = rotated_kernel_bank(size, mode, flat_list, angles)
    ky_max = max(k.shape[1] for k in bank)
    kx_max = max(k.shape[2] for k in bank)
    padded = np.zeros((len(bank), bank[0].shape[0], ky_max, kx_max), np.float32)
    for i, k in enumerate(bank):
        _, ky, kx = k.shape
        lo_y = (ky_max - 1) // 2 - (ky - 1) // 2
        lo_x = (kx_max - 1) // 2 - (kx - 1) // 2
        padded[i, :, lo_y : lo_y + ky, lo_x : lo_x + kx] = k
    return padded


def _flat_axis_combine(convs: jax.Array, axis: int = 0) -> jax.Array:
    """Flat-axis windowed sums of the reference's 3-D convolution.

    The reference broadcasts the DEM over the flat axis and runs a full 3-D
    ``signal.convolve(mode='same')`` (topo.py:431,443). Because the field is
    constant along that axis, the 3-D conv reduces to the F per-flat 2-D
    convolutions summed over a sliding window of the flat axis:
    ``out[f] = sum_g conv2d(dem, K[g])`` for ``g`` in
    ``[f+c-F+1, f+c] ∩ [0, F-1]`` with ``c=(F-1)//2``.
    """
    f = convs.shape[axis]
    c = (f - 1) // 2
    cums = jnp.cumsum(convs, axis=axis)

    def take(i):
        return jax.lax.index_in_dim(cums, i, axis=axis, keepdims=False)

    outs = []
    for i in range(f):
        n = i + c
        lo = max(0, n - f + 1)
        hi = min(f - 1, n)
        upper = take(hi)
        outs.append(upper if lo == 0 else upper - take(lo - 1))
    return jnp.stack(outs, axis=axis)


_STREAM_CACHE: dict = {}


def _streamed_scan_fn(h, w, n_flats, n_angles, ky_max, kx_max, fh, fw):
    """jit-compiled whole-bank scan for :func:`valley_ridge_streamed`,
    cached per static signature. ``filtered`` and ``params`` arrive as
    arguments (not closure constants) so GB-scale kernels never become jit
    constants — the compile-payload failure mode documented at
    ops/conv.py:612-618."""
    from topo_descriptors_tpu.ops.spline_rotate import rotate_std_canvas

    key = (h, w, n_flats, n_angles, ky_max, kx_max, fh, fw)
    fns = _STREAM_CACHE.get(key)
    if fns is not None:
        return fns
    sh, sw = (ky_max - 1) // 2, (kx_max - 1) // 2

    @jax.jit
    def field_fft(dem_std):
        return jnp.fft.rfft2(dem_std, s=(fh, fw))

    @jax.jit
    def chunk(f_dem, filtered, params, angles, norm, direction):
        def body(carry, xs):
            norm, direction = carry
            p, angle = xs
            canvas = rotate_std_canvas(filtered, p, (ky_max, kx_max))
            fk = jnp.fft.rfft2(canvas, s=(fh, fw))
            full = jnp.fft.irfft2(f_dem[None] * fk, s=(fh, fw))
            convs = jax.lax.slice(
                full, (0, sh, sw), (n_flats, sh + h, sw + w)
            ).astype(norm.dtype)
            combined = jnp.max(_flat_axis_combine(convs, axis=0), axis=0)
            greater = combined > norm
            return (
                jnp.where(greater, combined, norm),
                jnp.where(greater, angle, direction),
            ), None

        (norm, direction), _ = jax.lax.scan(
            body, (norm, direction), (params, angles)
        )
        return norm, direction

    fns = (field_fft, chunk)
    _STREAM_CACHE[key] = fns
    return fns


def valley_ridge_streamed(
    dem: jax.Array,
    size: int,
    mode: str,
    flat_list: Sequence[float] = (0, 0.15, 0.3),
    sigma: Optional[float] = None,
    stats: Optional[tuple] = None,
    n_angles: int = 180,
) -> List[jax.Array]:
    """Valley/ridge with the kernel rotation performed ON DEVICE, per angle.

    Semantics match :func:`valley_ridge` (reference topo.py:389-453) to
    float32 rounding; the restructure is for scales where the 180-angle bank
    cannot exist as one array — the reference's 20-100 km batch scales imply
    a 1.9-48 GB bank at 30 m resolution (the reference itself only ever
    holds ONE rotated stack at a time, topo.py:441-443, and pays 180 host
    rotations per scale).

    Execution model (everything device-resident):

    * the *base* V/U kernel stack (F, size, size) is uploaded once and
      spline-prefiltered once
      (:func:`~topo_descriptors_tpu.ops.spline_rotate.prefilter2d_o2`);
    * the field transform (rfft2 at the linear-convolution shape of the
      largest rotated extent) is hoisted out of the angle loop;
    * ONE ``lax.scan`` over all 180 angles: each step rotates the
      prefiltered stack into the anchored canvas with the order-2 spline
      gather (scipy-parity ~2e-6,
      :func:`~topo_descriptors_tpu.ops.spline_rotate.rotate_std_canvas`),
      convolves via the hoisted FFT, and applies the fused flat-combine +
      strictly-greater running max/argmax.

    Peak memory is O(one angle): ~4 canvas-sized transients regardless of
    scale — ~1.3 GB HBM at the 100 km scale where the static bank would be
    48 GB. No per-angle host work, no per-angle transfers.
    """
    if mode not in ("valley", "ridge"):
        raise ValueError(f"Unknown mode {mode!r}")
    from topo_descriptors_tpu.ops.spline_rotate import (
        prefilter2d_o2,
        rotation_params,
    )
    from topo_descriptors_tpu.utils.transfer import chunked_device_put

    if sigma:
        dem = gaussian_filter(dem, sigma)
    if stats is None:
        dem = (dem - jnp.mean(dem)) / jnp.std(dem)
    else:
        dem = (dem - stats[0]) / stats[1]

    base = (
        ridge_kernels(size, flat_list)
        if mode == "ridge"
        else valley_kernels(size, flat_list)
    )
    n_flats = len(flat_list)
    ky_max, kx_max = rotated_extent(size, np.arange(n_angles))
    h, w = dem.shape
    fh = _fft_shape(h + ky_max - 1)
    fw = _fft_shape(w + kx_max - 1)

    filtered = prefilter2d_o2(chunked_device_put(base.astype(np.float32)))
    params = np.stack(
        [rotation_params(size, float(a), ky_max, kx_max) for a in range(n_angles)]
    )
    angles = np.arange(n_angles, dtype=np.float32)
    # process the bank in fixed-size chunks of the scan (carry device-
    # resident between calls): keeps each device program seconds-long at
    # 100 km scales instead of one minutes-long request, and re-uses one
    # compiled chunk program. The tail chunk repeats the last angle, which
    # the strictly-greater update makes a no-op.
    chunk_angles = min(15, n_angles)
    pad = (-n_angles) % chunk_angles
    if pad:
        params = np.concatenate([params, np.repeat(params[-1:], pad, 0)])
        angles = np.concatenate([angles, np.repeat(angles[-1:], pad)])
    field_fft, chunk_fn = _streamed_scan_fn(
        h, w, n_flats, chunk_angles, ky_max, kx_max, fh, fw
    )
    f_dem = field_fft(dem)
    norm = jnp.full((h, w), -jnp.inf, dtype=dem.dtype)
    direction = jnp.zeros((h, w), dtype=dem.dtype)
    for a0 in range(0, len(angles), chunk_angles):
        norm, direction = chunk_fn(
            f_dem,
            filtered,
            jnp.asarray(params[a0 : a0 + chunk_angles]),
            jnp.asarray(angles[a0 : a0 + chunk_angles], dtype=dem.dtype),
            norm,
            direction,
        )
    return [jnp.clip(norm, 0.0, None), direction]


def valley_ridge(
    dem: jax.Array,
    size: int,
    mode: str,
    flat_list: Sequence[float] = (0, 0.15, 0.3),
    sigma: Optional[float] = None,
    bank: Optional[np.ndarray] = None,
    method: str = "auto",
    stats: Optional[tuple] = None,
    angle_chunk: int = 30,
) -> List[jax.Array]:
    """Valley/ridge index norm and direction (0..179 deg, clockwise).

    Parity target: reference ``valley_ridge`` (topo.py:389-453): optional
    Gaussian pre-smooth, global standardization (a cross-device psum in the
    sharded path), then for each integer angle a rotated-kernel 3-D
    convolution, max over flat variants and a running strictly-greater
    max/argmax across angles (ties keep the earliest angle).

    TPU restructure: the reference rotates kernels and convolves inside a
    Python loop per angle (180 host round-trips). Here the full rotated bank
    is a compile-time constant and the angle loop is a ``lax.scan`` over
    chunks of ``angle_chunk`` angles, each chunk one batched row-channel
    convolution (conv2d_bank_rowchan — a deep-contraction MXU mapping that
    measured ~440x faster than the naive C_in=1 conv at Basodino size) with
    a fused flat-combine, per-chunk argmax, and running cross-chunk
    max/argmax. The FFT path (large kernels) hoists the field transform out
    of the scan.
    """
    if mode not in ("valley", "ridge"):
        raise ValueError(f"Unknown mode {mode!r}")
    if bank is None and (
        method == "stream"
        or (
            method == "auto"
            and bank_nbytes(size, len(flat_list)) > CFG.valley_bank_max_bytes
        )
    ):
        # bank too large to exist as one static array (17-48 GB at the
        # reference's own 60-100 km example scales): stream angle chunks
        return valley_ridge_streamed(dem, size, mode, flat_list, sigma, stats)
    if sigma:
        dem = gaussian_filter(dem, sigma)

    if stats is None:
        dem = (dem - jnp.mean(dem)) / jnp.std(dem)
    else:
        dem = (dem - stats[0]) / stats[1]  # out-of-core: global, precomputed

    if bank is None:
        bank = prepare_valley_bank(size, mode, flat_list)
    a_angles, n_flats, ky, kx = bank.shape

    if method == "auto":
        # the row-channel MXU conv needs a KY-deep row stack of the field;
        # switch to FFT only when that stack outgrows its HBM budget (the
        # MXU path wins on arithmetic at every size that fits)
        rows_bytes = ky * dem.shape[0] * dem.shape[1] * 4
        method = "fft" if rows_bytes > CFG.rowchan_max_bytes else "direct"
    while a_angles % angle_chunk:
        angle_chunk -= 1
    n_chunks = a_angles // angle_chunk

    h, w = dem.shape
    if method == "fft":
        fh = _fft_shape(h + ky - 1)
        fw = _fft_shape(w + kx - 1)
        f_dem = jnp.fft.rfft2(dem, s=(fh, fw))
        sh, sw = (ky - 1) // 2, (kx - 1) // 2

        def conv_chunk(kernels):  # (chunk*F, ky, kx) -> (chunk*F, H, W)
            fk = jnp.fft.rfft2(kernels, s=(fh, fw))
            full = jnp.fft.irfft2(f_dem[None] * fk, s=(fh, fw))
            return jax.lax.slice(
                full, (0, sh, sw), (kernels.shape[0], sh + h, sw + w)
            ).astype(dem.dtype)

    else:

        def conv_chunk(kernels):
            # bf16x3 (HIGH) keeps ~2^-21 relative error on the standardized
            # field — far inside the descriptor's tolerance — at half the
            # MXU passes of HIGHEST (bf16x6)
            return conv2d_bank_rowchan(
                dem, kernels, padding="same",
                precision=jax.lax.Precision.HIGH,
            )

    bank_chunks = jnp.asarray(
        bank.reshape(n_chunks, angle_chunk * n_flats, ky, kx), dtype=dem.dtype
    )

    def step(carry, inputs):
        norm, direction = carry
        kernels, chunk_idx = inputs
        convs = conv_chunk(kernels).reshape(angle_chunk, n_flats, h, w)
        combined = jnp.max(_flat_axis_combine(convs, axis=1), axis=1)
        # within-chunk: argmax keeps the earliest angle on ties, matching the
        # reference's strictly-greater running update (topo.py:445)
        chunk_best = jnp.max(combined, axis=0)
        chunk_arg = jnp.argmax(combined, axis=0).astype(dem.dtype)
        greater = chunk_best > norm
        norm = jnp.where(greater, chunk_best, norm)
        direction = jnp.where(
            greater, chunk_idx * angle_chunk + chunk_arg, direction
        )
        return (norm, direction), None

    init = (
        jnp.full((h, w), -jnp.inf, dtype=dem.dtype),
        jnp.zeros((h, w), dtype=dem.dtype),
    )
    (index_norm, index_dir), _ = jax.lax.scan(
        step, init, (bank_chunks, jnp.arange(n_chunks, dtype=dem.dtype))
    )
    return [jnp.clip(index_norm, 0.0, None), index_dir]
