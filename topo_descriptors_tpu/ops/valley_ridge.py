"""Valley / ridge index over 180 rotated V/U-kernel orientations."""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from topo_descriptors_tpu.config import CFG
from topo_descriptors_tpu.kernels.valley import rotated_kernel_bank
from topo_descriptors_tpu.ops.conv import (
    _fft_shape,
    conv2d_bank_rowchan,
    gaussian_filter,
)


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
