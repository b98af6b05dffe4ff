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


def test_hybrid_mesh_train_step():
    """Full train step on a ('dcn', 'dp', 'tp') 2x2x2 mesh: batch sharded
    over both data axes, decoder TP, ZeRO over dp — gradients all-reduce
    across slices implicitly."""
    from infinite_video_tpu.models import videochat2 as vc2
    from infinite_video_tpu.models.decoder import Decoder
    from infinite_video_tpu.parallel.sharding import shard_params
    from infinite_video_tpu.training.optim import (cosine_warmup_schedule,
                                                   make_optimizer)
    from infinite_video_tpu.training.trainer import (init_train_state,
                                                     make_train_step)

    mesh = make_mesh(dp=2, tp=2, dcn_dp=2)
    cfg = vc2.tiny_config()
    encoder, decoder = vc2.VideoChat2Encoder(cfg), Decoder(cfg.decoder)
    b = 4  # dcn*dp
    t = cfg.vit.num_frames
    pixels = jax.random.normal(jax.random.PRNGKey(0), (b, t, 224, 224, 3)) * 0.1
    instr = jnp.tile(jnp.arange(6)[None], (b, 1))
    pre = jnp.tile(jnp.arange(4)[None], (b, 1))
    post = jnp.tile(jnp.arange(5)[None], (b, 1))
    qn = cfg.total_query_tokens
    labels = jnp.concatenate([
        jnp.full((b, 4 + qn), -100, jnp.int32),
        jnp.tile(jnp.arange(5)[None], (b, 1)).astype(jnp.int32)], axis=1)
    batch = {"pixels": pixels, "instruction_ids": instr, "pre_ids": pre,
             "post_ids": post, "labels": labels}

    enc_params = encoder.init(jax.random.PRNGKey(1), pixels[:1],
                              encoder.init_states(1),
                              instruction_ids=instr[:1])["params"]
    dec_params = decoder.init(jax.random.PRNGKey(2), input_ids=pre[:1])["params"]
    with mesh:
        params = {"encoder": shard_params(enc_params, mesh, rules=()),
                  "decoder": shard_params(dec_params, mesh)}
        tx = make_optimizer(cosine_warmup_schedule(1e-3, 2, 10))
        state = init_train_state(params, tx, mesh=mesh, zero=True)
        sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch)
        # batch leading axis is split over dcn x dp = 4 -> 1 row per data group
        assert sharded["pixels"].addressable_shards[0].data.shape[0] == 1
        step = jax.jit(make_train_step(encoder, decoder, tx, mesh=mesh,
                                       zero=True))
        state, metrics = step(state, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
