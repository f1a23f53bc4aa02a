"""Pallas kernel correctness (interpret mode on CPU).

The compiled Mosaic path is exercised on real TPU by bench.py; here the
same kernel body runs under the Pallas interpreter and must match the XLA
formulation exactly.
"""

import jax
import numpy as np
import pytest
from jax.experimental import pallas as pl

import topo_descriptors_tpu.ops.pallas.sx_block as sxb
from topo_descriptors_tpu import kernels, ops


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)  # TPU-only knob
        return orig(*args, **kwargs)

    monkeypatch.setattr(sxb.pl, "pallas_call", interp)


def test_sx_pallas_matches_xla(dem_tiny, interpret_pallas):
    o, d, b = kernels.sx_offsets(0.0, 300.0, 30.0, 30.0)
    ref = np.asarray(jax.jit(lambda x: ops.sx(x, o, d, b, method="xla"))(dem_tiny))
    out = np.asarray(sxb.sx_pallas(dem_tiny, o, d, b, block=(16, 32)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)


def test_sx_pallas_ragged_blocks(dem_tiny, interpret_pallas):
    # grid shape not divisible by the block: round-up + crop path
    o, d, b = kernels.sx_offsets(90.0, 250.0, 30.0, 30.0)
    ref = np.asarray(jax.jit(lambda x: ops.sx(x, o, d, b, method="xla"))(dem_tiny))
    out = np.asarray(sxb.sx_pallas(dem_tiny, o, d, b, block=(32, 32)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)


def test_sx_sweep_pallas_matches_xla(dem_tiny, interpret_pallas):
    # ragged fan: per-azimuth ray counts differ, CSR grouping must drop the
    # rectangular padding rows without disturbing real rays
    o, d, b = kernels.sx_sweep_offsets([0.0, 45.0, 120.0, 290.0], 300.0, 30.0, 30.0)
    ref = np.asarray(
        jax.jit(lambda x: ops.sx_sweep(x, o, d, b, method="xla"))(dem_tiny)
    )
    out = np.asarray(sxb.sx_sweep_pallas(dem_tiny, o, d, b, block=(16, 32)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)


def test_sx_sweep_pallas_distance0_quirk(dem_tiny, interpret_pallas):
    # radius 250 m at 30 m -> even distance window: the reference's window
    # centre is one pixel off the ray convergence point, leaving a ray pixel
    # at distance 0 whose candidates are +/-90 deg (ops.sx docstring quirk)
    o, d, b = kernels.sx_sweep_offsets([225.0, 45.0], 250.0, 30.0, 30.0)
    assert np.any(d == 0.0), "geometry must hit the distance-0 quirk"
    ref = np.asarray(
        jax.jit(lambda x: ops.sx_sweep(x, o, d, b, method="xla"))(dem_tiny)
    )
    out = np.asarray(sxb.sx_sweep_pallas(dem_tiny, o, d, b, block=(32, 32)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)


def test_sx_sweep_pallas_with_radius_min(dem_tiny, interpret_pallas):
    # radius_min masks near pixels to NaN distance mid-table: the CSR pack
    # must keep them (NaN inv -> fmax-ignored) but drop only the pad rows
    o, d, b = kernels.sx_sweep_offsets(
        [10.0, 200.0, 355.0], 300.0, 30.0, 30.0, radius_min=100.0
    )
    assert np.isnan(d).any()
    ref = np.asarray(
        jax.jit(lambda x: ops.sx_sweep(x, o, d, b, method="xla"))(dem_tiny)
    )
    out = np.asarray(sxb.sx_sweep_pallas(dem_tiny, o, d, b, block=(16, 32)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)


def test_sx_sweep_auto_backend_selects_xla_off_tpu(dem_tiny):
    o, d, b = kernels.sx_sweep_offsets(list(range(0, 360, 60)), 200.0, 30.0, 30.0)
    out = np.asarray(jax.jit(lambda x: ops.sx_sweep(x, o, d, b))(dem_tiny))
    ref = np.asarray(jax.jit(lambda x: ops.sx_sweep(x, o, d, b, method="xla"))(dem_tiny))
    np.testing.assert_array_equal(out, ref)


def test_sx_auto_backend_selects_xla_off_tpu(dem_tiny):
    # on CPU the auto path must stay on the XLA formulation
    o, d, b = kernels.sx_offsets(0.0, 200.0, 30.0, 30.0)
    out = np.asarray(jax.jit(lambda x: ops.sx(x, o, d, b))(dem_tiny))
    ref = np.asarray(jax.jit(lambda x: ops.sx(x, o, d, b, method="xla"))(dem_tiny))
    np.testing.assert_array_equal(out, ref)
