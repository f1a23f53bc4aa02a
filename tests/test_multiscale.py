"""Fused multi-scale / multi-azimuth batch ops vs their per-item equivalents."""

import jax
import numpy as np
import pytest

from topo_descriptors_tpu import kernels, ops


def test_disk_descriptors_matches_per_scale(dem_small):
    sizes = (5, 9, 15)
    batch = jax.jit(lambda x: ops.disk_descriptors(x, sizes))(dem_small)
    assert batch["tpi"].shape == (3,) + dem_small.shape
    for i, size in enumerate(sizes):
        tpi_i = np.asarray(jax.jit(lambda x: ops.tpi(x, size))(dem_small))
        std_i = np.asarray(jax.jit(lambda x: ops.std(x, size))(dem_small))
        np.testing.assert_allclose(
            np.asarray(batch["tpi"][i]), tpi_i, rtol=1e-4, atol=2e-2
        )
        # near-zero-variance pixels carry the uncentred-moment f32 noise
        # (see test_std_parity); the batch FFT path and the per-scale direct
        # path land on different sides of it
        np.testing.assert_allclose(
            np.asarray(batch["std"][i]), std_i, rtol=2e-2, atol=5e-1
        )


def test_disk_descriptors_with_smoothing(dem_small):
    batch = jax.jit(lambda x: ops.disk_descriptors(x, (9,), sigma=1.5))(dem_small)
    single = np.asarray(jax.jit(lambda x: ops.tpi(x, 9, 1.5))(dem_small))
    np.testing.assert_allclose(
        np.asarray(batch["tpi"][0]), single, rtol=1e-4, atol=2e-2
    )


def test_disk_descriptors_tpi_only(dem_small):
    batch = jax.jit(
        lambda x: ops.disk_descriptors(x, (7,), compute_std=False)
    )(dem_small)
    assert set(batch) == {"tpi"}


def test_sx_sweep_matches_per_azimuth(dem_tiny):
    azimuths = [0.0, 90.0, 225.0]
    offsets, distances, border = kernels.sx_sweep_offsets(
        azimuths, 250.0, 30.0, 30.0
    )
    sweep = np.asarray(
        jax.jit(lambda x: ops.sx_sweep(x, offsets, distances, border))(dem_tiny)
    )
    assert sweep.shape == (3,) + dem_tiny.shape
    for i, azimuth in enumerate(azimuths):
        o, d, b = kernels.sx_offsets(azimuth, 250.0, 30.0, 30.0)
        single = np.asarray(jax.jit(lambda x: ops.sx(x, o, d, b))(dem_tiny))
        np.testing.assert_allclose(sweep[i], single, rtol=1e-5, atol=1e-4)


def test_compute_sx_sweep_driver(tmp_path):
    from topo_descriptors_tpu import pipeline
    from topo_descriptors_tpu.io import basodino_like_dem, read_raster

    dem = basodino_like_dem(ny=48, nx=64, projected=True)
    files = pipeline.compute_sx_sweep(
        dem, [0, 90, 180, 270], radius=300, outdir=tmp_path
    )
    assert [p.name for p in files] == [
        "topo_SX_RADIUS300_AZIMUTH0.nc",
        "topo_SX_RADIUS300_AZIMUTH90.nc",
        "topo_SX_RADIUS300_AZIMUTH180.nc",
        "topo_SX_RADIUS300_AZIMUTH270.nc",
    ]
    # each azimuth must equal the single-azimuth driver's output
    single = pipeline.compute_sx(dem, 90, 300, outdir=tmp_path / "single")
    a = read_raster(files[1]).data
    b = read_raster(single[0]).data
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
