"""Multi-device parity: sharded shard_map ops vs single-chip ops.

Runs on an 8-virtual-CPU-device ('gy','gx') mesh (conftest sets
--xla_force_host_platform_device_count=8), exercising halo exchange
(including multi-hop), boundary fills, and global-stat collectives. Results
must match the single-chip jit ops to float32 round-off.
"""

import jax
import numpy as np
import pytest

from topo_descriptors_tpu import kernels, ops
from topo_descriptors_tpu.kernels.sx_geometry import sx_offsets
from topo_descriptors_tpu.parallel.mesh import make_mesh
from topo_descriptors_tpu.parallel.sharded import ShardedOps


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "tests need 8 virtual devices"
    return make_mesh(shape=(2, 4), devices=jax.devices()[:8])


@pytest.fixture(scope="module")
def sops(mesh):
    return ShardedOps(mesh)


@pytest.fixture(scope="module")
def dem64(rng):
    from scipy import ndimage

    noise = rng.standard_normal((64, 96))
    smooth = ndimage.gaussian_filter(noise, 5.0)
    return (1400.0 + 800.0 * smooth / np.abs(smooth).max()).astype(np.float32)


def test_sharded_gaussian(sops, dem64):
    single = np.asarray(jax.jit(lambda x: ops.gaussian_filter(x, 2.5))(dem64))
    shard = np.asarray(sops.gaussian(sops.put(dem64), 2.5))
    np.testing.assert_allclose(shard, single, rtol=1e-6, atol=1e-3)


def test_sharded_gaussian_halo_wider_than_block(sops, dem64):
    # sigma 6 -> radius 24 vs block height 32: halo close to block size
    single = np.asarray(jax.jit(lambda x: ops.gaussian_filter(x, 6.0))(dem64))
    shard = np.asarray(sops.gaussian(sops.put(dem64), 6.0))
    np.testing.assert_allclose(shard, single, rtol=1e-6, atol=1e-3)


@pytest.mark.parametrize("size,sigma", [(7, None), (15, 1.75)])
def test_sharded_tpi(sops, dem64, size, sigma):
    single = np.asarray(jax.jit(lambda x: ops.tpi(x, size, sigma))(dem64))
    shard = np.asarray(sops.tpi(sops.put(dem64), size, sigma))
    np.testing.assert_allclose(shard, single, rtol=1e-5, atol=2e-2)


@pytest.mark.parametrize("size", [7, 15])
def test_sharded_std(sops, dem64, size):
    single = np.asarray(jax.jit(lambda x: ops.std(x, size))(dem64))
    shard = np.asarray(sops.std(sops.put(dem64), size))
    np.testing.assert_allclose(shard, single, rtol=1e-3, atol=5e-2)


@pytest.mark.parametrize("sigma,ratio", [(0.5, 1.0), (2.25, 1.0), (2.0, 1.5)])
def test_sharded_gradient(sops, dem64, sigma, ratio):
    ny, nx = dem64.shape
    res = {
        "x": np.full(nx, 30.0, np.float32),
        "y": np.full(ny, -30.0, np.float32),
    }
    single = jax.jit(lambda x: ops.gradient(x, sigma, res, ratio))(dem64)
    shard = sops.gradient(sops.put(dem64), sigma, res, ratio)
    for s, sh in zip(single, shard):
        np.testing.assert_allclose(
            np.asarray(sh), np.asarray(s), rtol=1e-3, atol=2e-2
        )


def test_sharded_valley_ridge(sops, dem64):
    single = jax.jit(
        lambda x: ops.valley_ridge(x, 7, "valley", (0, 0.2))
    )(dem64)
    shard = sops.valley_ridge(sops.put(dem64), 7, "valley", (0, 0.2))
    np.testing.assert_allclose(
        np.asarray(shard[0]), np.asarray(single[0]), rtol=1e-4, atol=2e-3
    )
    # direction ties can flip at float round-off; require near-total agreement
    assert (np.asarray(shard[1]) != np.asarray(single[1])).mean() < 0.02


def test_sharded_sx_multihop_halo(sops, dem64):
    # radius 600 m at 30 m -> border 20 px > block height 32/2: the halo
    # spans whole neighbour blocks on the 2-way y axis (multi-hop path)
    offsets, distances, border = sx_offsets(30.0, 600.0, 30.0, 30.0)
    single = np.asarray(
        jax.jit(lambda x: ops.sx(x, offsets, distances, border))(dem64)
    )
    shard = np.asarray(sops.sx(sops.put(dem64), offsets, distances, border))
    np.testing.assert_allclose(shard, single, rtol=1e-4, atol=1e-3)


def test_sharded_sx_small_radius(sops, dem64):
    offsets, distances, border = sx_offsets(120.0, 200.0, 30.0, 30.0)
    single = np.asarray(
        jax.jit(lambda x: ops.sx(x, offsets, distances, border))(dem64)
    )
    shard = np.asarray(sops.sx(sops.put(dem64), offsets, distances, border))
    np.testing.assert_allclose(shard, single, rtol=1e-4, atol=1e-3)


def test_mesh_shape_validation(sops, dem64):
    with pytest.raises(ValueError):
        sops.put(np.zeros((63, 96), np.float32))


def test_host_local_to_global(mesh, sops, dem64):
    # single-process: all mesh devices are local; assemble the global array
    # from per-device blocks and check it matches a plain device_put
    from topo_descriptors_tpu.parallel import runtime

    gy, gx = mesh.devices.shape
    bh, bw = dem64.shape[0] // gy, dem64.shape[1] // gx
    blocks = [
        dem64[i * bh : (i + 1) * bh, j * bw : (j + 1) * bw]
        for i in range(gy)
        for j in range(gx)
    ]
    global_arr = runtime.host_local_to_global(mesh, blocks)
    np.testing.assert_array_equal(np.asarray(global_arr), dem64)
    # and it is directly consumable by the sharded ops
    out = np.asarray(sops.tpi(global_arr, 7))
    ref = np.asarray(sops.tpi(sops.put(dem64), 7))
    np.testing.assert_array_equal(out, ref)


def test_runtime_initialize_single_process():
    from topo_descriptors_tpu.parallel import runtime

    runtime.initialize()  # must be a safe no-op without a coordinator
    runtime.initialize()  # idempotent
