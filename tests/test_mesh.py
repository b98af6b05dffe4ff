"""Mesh construction: 2D shapes, device slicing, hybrid DCN axis, and a
sharded computation on a dp-only 8-way mesh (beyond the dryrun's 4x2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from infinite_video_tpu.parallel.mesh import data_sharding, make_mesh


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_make_mesh_shapes(dp, tp):
    mesh = make_mesh(dp=dp, tp=tp)
    assert dict(mesh.shape) == {"dp": dp, "tp": tp}


def test_make_mesh_rejects_mismatch():
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=2)


def test_make_mesh_dcn_axis():
    mesh = make_mesh(dp=2, tp=2, dcn_dp=2)
    assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "tp": 2}
    # slice-local dp x tp blocks: each dcn row holds 4 contiguous devices
    devs = np.asarray(mesh.devices).reshape(2, -1)
    assert len(set(d.id for d in devs.flatten())) == 8


def test_dp8_sharded_reduction():
    """dp=8 (no tp): a batch-sharded computation executes with the batch
    split 1-per-device and matches the unsharded result."""
    mesh = make_mesh(dp=8, tp=1)
    x = jnp.arange(8 * 6, dtype=jnp.float32).reshape(8, 6)
    with mesh:
        xs = jax.device_put(x, data_sharding(mesh, x.ndim))
        assert len(xs.addressable_shards) == 8
        assert xs.addressable_shards[0].data.shape == (1, 6)
        y = jax.jit(lambda a: (a * 2).sum(axis=1))(xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray((x * 2).sum(1)))


def test_make_mesh_explicit_devices_subset():
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    assert dict(mesh.shape) == {"dp": 2, "tp": 2}
