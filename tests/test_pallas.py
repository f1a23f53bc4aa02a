"""Pallas kernel correctness (interpret mode on CPU).

The compiled Mosaic path is exercised on real TPU by bench.py; here the
same kernel body runs under the Pallas interpreter and must match the XLA
formulation exactly.
"""

import jax
import numpy as np
import pytest
from jax.experimental import pallas as pl

import topo_descriptors_tpu.ops.pallas.disk_sat as dsat
import topo_descriptors_tpu.ops.pallas.sx_block as sxb
from topo_descriptors_tpu import kernels, ops
from topo_descriptors_tpu.ops import conv as C


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)  # TPU-only knob
        return orig(*args, **kwargs)

    monkeypatch.setattr(sxb.pl, "pallas_call", interp)
    monkeypatch.setattr(dsat.pl, "pallas_call", interp)


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


def test_sx_dedupe_is_exact():
    # duplicates carry identical (offset -> distance) pairs; dedup keeps
    # exactly the unique pair set (NaNs keyed by position, not value)
    o, d, b = kernels.sx_offsets(0.0, 500.0, 30.0, 30.0)
    do, dd = kernels.sx_dedupe(o, d)
    assert len(do) < len(o)  # the r=500m fan is ~7x redundant
    def pairs(offs, dists):
        return {
            (int(y), int(x), -1.0 if np.isnan(v) else float(v))
            for (y, x), v in zip(offs, dists)
        }
    assert pairs(do, dd) == pairs(o, d)
    assert len(do) == len({(int(y), int(x)) for y, x in o})


def test_sx_chunk_dist_table_partition():
    o, d, b = kernels.sx_offsets(0.0, 2000.0, 30.0, 30.0)
    do, dd = kernels.sx_dedupe(o, d)
    with np.errstate(divide="ignore"):
        inv = (1.0 / dd).astype(np.float32)
    groups = {}
    for (oy, ox), iv in zip(do, inv):
        groups.setdefault(float(iv), []).append((int(oy), int(ox)))
    table = tuple((iv, tuple(g)) for iv, g in sorted(groups.items()))
    chunks = sxb._chunk_dist_table(table, sxb.CHUNK_RAYS)
    assert len(chunks) >= 2  # the deduped r=2000m fan exceeds one chunk
    flat = [e for c in chunks for e in c]
    assert flat == list(table)  # order + content preserved
    for c in chunks:
        rays = sum(len(g) for _, g in c)
        assert rays <= sxb.CHUNK_RAYS or len(c) == 1


def test_sx_pallas_chunked_matches_xla(dem_tiny, interpret_pallas, monkeypatch):
    # force chunking with a tiny budget: multiple Mosaic programs + XLA
    # fmax combine must equal the single-program result
    o, d, b = kernels.sx_offsets(0.0, 300.0, 30.0, 30.0)
    ref = np.asarray(jax.jit(lambda x: ops.sx(x, o, d, b, method="xla"))(dem_tiny))
    monkeypatch.setattr(sxb, "CHUNK_RAYS", 5)
    out = np.asarray(sxb.sx_pallas(dem_tiny, o, d, b))
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


def test_sx_fan_pallas_matches_xla(dem_tiny, interpret_pallas, monkeypatch):
    # the static-table fan kernel (auto route on TPU), forced into several
    # azimuth groups by a tiny ray budget; ragged per-azimuth counts
    o, d, b = kernels.sx_sweep_offsets(
        [0.0, 45.0, 120.0, 290.0], 300.0, 30.0, 30.0
    )
    ref = np.asarray(
        jax.jit(lambda x: ops.sx_sweep(x, o, d, b, method="xla"))(dem_tiny)
    )
    monkeypatch.setattr(sxb, "FAN_RAY_BUDGET", 40)
    out = np.asarray(sxb.sx_fan_pallas(dem_tiny, o, d, b, block=(16, 32)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)


def test_sx_fan_pallas_radius_min_and_quirk(dem_tiny, interpret_pallas):
    o, d, b = kernels.sx_sweep_offsets(
        [225.0, 45.0], 250.0, 30.0, 30.0, radius_min=100.0
    )
    ref = np.asarray(
        jax.jit(lambda x: ops.sx_sweep(x, o, d, b, method="xla"))(dem_tiny)
    )
    out = np.asarray(sxb.sx_fan_pallas(dem_tiny, o, d, b, block=(32, 32)))
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


def _sat_call(xs, kernel, mode, block=(16, 128)):
    kernel = np.asarray(kernel, np.float32)
    runs = C._binary_kernel_runs(kernel[::-1, ::-1])
    assert runs is not None
    kh, kw = kernel.shape
    if mode == "same":
        pads = (C._same_pads(kh), C._same_pads(kw))
    else:
        pads = ((0, 0), (0, 0))
    return np.asarray(dsat.disk_conv_sat_pallas(
        jax.numpy.asarray(xs), kernel.shape, runs, pads, block=block
    ))


def _scipy_conv(xs, kernel, mode):
    from scipy import signal

    return np.stack([
        signal.convolve(x.astype(np.float64), np.asarray(kernel, np.float64),
                        mode=mode)
        for x in xs
    ]).astype(np.float32)


def test_disk_sat_pallas_same_disk(dem_tiny, interpret_pallas):
    kernel = kernels.circular_kernel(9)
    xs = dem_tiny[None]
    out = _sat_call(xs, kernel, "same")
    np.testing.assert_allclose(out, _scipy_conv(xs, kernel, "same"),
                               rtol=1e-5, atol=1e-2)


def test_disk_sat_pallas_center_zero_tpi_disk(dem_tiny, interpret_pallas):
    # TPI's centre-zeroed disk: the centre row decomposes into TWO runs
    kernel = kernels.circular_kernel(7, exclude_center=True)
    xs = dem_tiny[None]
    out = _sat_call(xs, kernel, "same")
    np.testing.assert_allclose(out, _scipy_conv(xs, kernel, "same"),
                               rtol=1e-5, atol=1e-2)


def test_disk_sat_pallas_even_kernel_anchor(dem_tiny, interpret_pallas):
    # even kernel dims hit the asymmetric 'same' anchoring (k-1-s, s)
    kernel = np.ones((4, 6), np.float32)
    kernel[1, 2] = 0.0
    xs = dem_tiny[None]
    out = _sat_call(xs, kernel, "same")
    np.testing.assert_allclose(out, _scipy_conv(xs, kernel, "same"),
                               rtol=1e-5, atol=1e-2)


def test_disk_sat_pallas_valid_multifield(rng, interpret_pallas):
    # STD's three moment fields share the window DMA via the field grid dim
    xs = rng.standard_normal((3, 40, 48)).astype(np.float32) * 100.0
    kernel = kernels.circular_kernel(11)
    out = _sat_call(xs, kernel, "valid")
    np.testing.assert_allclose(out, _scipy_conv(xs, kernel, "valid"),
                               rtol=1e-5, atol=1e-2)


def test_disk_sat_pallas_multiblock_ragged(rng, interpret_pallas):
    # output bigger than one block in both dims, not divisible: round-up+crop
    xs = rng.standard_normal((1, 37, 150)).astype(np.float32) * 100.0
    kernel = kernels.circular_kernel(5)
    out = _sat_call(xs, kernel, "same", block=(16, 128))
    np.testing.assert_allclose(out, _scipy_conv(xs, kernel, "same"),
                               rtol=1e-5, atol=1e-2)


def test_disk_sat_heuristic_matches_kernel_geometry():
    # the routing estimate must use the block the kernel actually picks
    (by, bx), (wy, wx) = dsat.sat_block_and_window((67, 67), 900, 1440)
    assert by <= 256 and bx <= 512
    assert wy >= by + 67 - 1 and wy % 8 == 0
    assert wx >= bx + 67 and wx % 128 == 0
    # small outputs shrink the block with it
    (by2, bx2), (wy2, wx2) = dsat.sat_block_and_window((7, 7), 40, 48)
    assert by2 == 40 and bx2 == 128
    assert wy2 % 8 == 0 and wx2 % 128 == 0


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


def test_sx_auto_block_by_ray_count():
    # measured VMEM live-set constraint (sx_block.auto_block docstring,
    # round 5): Mosaic keeps every window slice live, so the (256, 512)
    # block (0.5 MB/slice) only fits <= 128 rays; beyond that the small
    # (64, 256) block carries up to ~1000
    assert sxb.auto_block(32) == (256, 512)
    assert sxb.auto_block(128) == (256, 512)
    assert sxb.auto_block(240) == (64, 256)
    assert sxb.auto_block(986) == (64, 256)
    # chunks built for the fast block must respect its live-set budget
    assert sxb.CHUNK_RAYS * 256 * 512 * 4 <= 64 * 1024 * 1024


def test_sx_sweep_auto_routing_rules():
    # on TPU, auto routes small-K wide fans and any <=4-azimuth fan to the
    # per-azimuth constant-offset kernels, large-K wide fans to the scan
    # (measured v5e numbers in the sx_sweep docstring); off-TPU always xla
    from topo_descriptors_tpu.ops.sx import _sweep_auto_method

    # on TPU small fans take per-azimuth constant-offset kernels; wide fans
    # take the one-program XLA scan (Mosaic compile economics, see
    # _sweep_auto_method docstring); the Pallas routes stay opt-in by name
    assert _sweep_auto_method(2, 986, True) == "pallas"
    assert _sweep_auto_method(36, 986, True) == "xla"
    assert _sweep_auto_method(360, 240, True) == "xla"
    assert _sweep_auto_method(36, 240, False) == "xla"


def test_sx_auto_routing_by_ray_count_and_grid(monkeypatch):
    """Round-5 measured routing for single-azimuth sx() on TPU: Pallas for
    fans that fit one fast-block program (K <= 128) or big grids; the
    deduped XLA scan (its HBM floor beats every compile-viable Pallas
    shape) for wide fans on small grids."""
    import importlib

    import jax.numpy as jnp

    sxmod = importlib.import_module("topo_descriptors_tpu.ops.sx")
    monkeypatch.setattr(sxmod, "_on_tpu", lambda: True)
    calls = {}

    def fake_pallas(dem, offsets, distances, border, height,
                    zero_border=True):
        calls["method"] = "pallas"
        return jnp.zeros(dem.shape, jnp.float32)

    monkeypatch.setattr(
        "topo_descriptors_tpu.ops.pallas.sx_block.sx_pallas", fake_pallas
    )

    def route(n_rays, shape):
        calls.clear()
        offs = np.stack([np.arange(1, n_rays + 1),
                         np.zeros(n_rays, int)], axis=1).astype(np.int64)
        dists = 30.0 * np.arange(1, n_rays + 1).astype(np.float64)
        sxmod.sx(jnp.zeros(shape, jnp.float32), offs, dists,
                 border=int(n_rays))
        return calls.get("method", "xla")

    assert route(32, (64, 128)) == "pallas"      # small fan, any grid
    assert route(200, (3000, 3000)) == "pallas"  # big grid amortizes
    assert route(200, (900, 1440)) == "xla"      # wide fan, small grid
