"""Fused multi-scale disk descriptors: TPI + rolling STD for S scales in one
device program.

The reference computes each (descriptor, scale) independently — for a
12-scale batch that is 12 Gaussian-smooths + 12 TPI convs + 24 STD convs,
each a fresh pass over the DEM (scripts/compute_topo_descriptors.py:44-62).
On TPU the whole batch collapses:

* the three moment fields (z-c, t-c, (t-c)^2) are transformed **once**
  (3 rFFTs), every scale reuses them;
* each scale adds one kernel rFFT + three inverse transforms, batched;
* TPI costs nothing beyond STD: the centre-zeroed disk conv is the full
  disk conv minus the centre value (conv(z, disk - delta) = conv(z, disk)
  - z), so TPI is an elementwise epilogue on STD's intermediates.

Arithmetic per extra scale drops ~3x vs independent calls, and XLA fuses all
epilogues into the inverse-FFT consumers.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from topo_descriptors_tpu.config import CFG
from topo_descriptors_tpu.kernels.disk import circular_kernel
from topo_descriptors_tpu.ops.conv import (
    _fft_shape,
    edge_count_plane_device,
    gaussian_filter,
)


def disk_descriptors(
    dem: jax.Array,
    sizes: Sequence[int],
    sigma: Optional[float] = None,
    int32_parity: Optional[bool] = None,
    compute_tpi: bool = True,
    compute_std: bool = True,
) -> Dict[str, jax.Array]:
    """TPI and/or rolling STD at every disk size, sharing all transforms.

    Semantics per scale are identical to :func:`ops.tpi` / :func:`ops.std`
    (reference topo.py:145-181, 272-307) with one shared pre-smooth sigma
    (pass None for raw). Returns ``{"tpi": (S,H,W), "std": (S,H,W)}``.
    """
    if int32_parity is None:
        int32_parity = CFG.std_int32_parity
    sizes = [int(s) for s in sizes]
    if sigma:
        dem = gaussian_filter(dem, sigma)

    h, w = dem.shape
    kmax = max(sizes)
    fh = _fft_shape(h + kmax - 1)
    fw = _fft_shape(w + kmax - 1)

    c = jnp.round(jnp.mean(dem))
    z_c = dem - c
    need_moments = compute_std
    if need_moments:
        t = jnp.trunc(dem) if int32_parity else dem
        t_c = t - c
        fields = jnp.stack([z_c, t_c, t_c * t_c])  # (3, H, W)
    else:
        fields = z_c[None]
    f_fields = jnp.fft.rfft2(fields, s=(fh, fw))  # shared across scales

    # kernel bank: all disks zero-padded into one (S, fh, fw) transform batch
    kernels = np.zeros((len(sizes), fh, fw), dtype=np.float32)
    counts = []
    ksums = np.zeros(len(sizes), dtype=np.float32)
    for i, size in enumerate(sizes):
        disk = circular_kernel(size)
        kernels[i, :size, :size] = disk
        counts.append(edge_count_plane_device((h, w), disk))
        ksums[i] = disk.sum()
    counts = jnp.stack(counts)
    f_kernels = jnp.fft.rfft2(jnp.asarray(kernels), axes=(-2, -1))

    # batched product: (S, F, fh, fw/2+1) -> inverse -> per-scale same-crop
    prod = f_kernels[:, None] * f_fields[None]
    full = jnp.fft.irfft2(prod, s=(fh, fw))

    counts_j = counts.astype(dem.dtype)
    ksums_j = jnp.asarray(ksums, dtype=dem.dtype)

    out_tpi = []
    out_std = []
    for i, size in enumerate(sizes):
        s_off = (size - 1) // 2
        convs = jax.lax.slice(
            full[i], (0, s_off, s_off), (full.shape[1], s_off + h, s_off + w)
        )
        z_conv = convs[0]
        count = counts_j[i]
        ksum = ksums_j[i]
        if compute_tpi:
            # centre-zeroed disk: subtract the centre tap contribution
            mid_in = z_c  # conv with the centre delta is the field itself
            tpi_sum = (z_conv - mid_in) + c * (count - 1.0)
            out_tpi.append(dem - tpi_sum / (ksum - 1.0))
        if compute_std:
            t_conv, q_conv = convs[1], convs[2]
            sum_sq = q_conv + 2.0 * c * t_conv + c * c * count
            sum_dem = z_conv + c * count
            var = (sum_sq - sum_dem * sum_dem / ksum) / (ksum - 1.0)
            out_std.append(jnp.sqrt(jnp.clip(var, 0.0, None)))

    result: Dict[str, jax.Array] = {}
    if compute_tpi:
        result["tpi"] = jnp.stack(out_tpi)
    if compute_std:
        result["std"] = jnp.stack(out_std)
    return result
