"""Gradient accumulation: accum_steps microbatches reproduce the large-batch
update (accum_grad_iters, InfVideoLLaMA/tasks/base_task.py:150-241)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinite_video_tpu.models import videochat2 as vc2
from infinite_video_tpu.models.decoder import Decoder
from infinite_video_tpu.training.optim import (cosine_warmup_schedule,
                                               make_optimizer)
from infinite_video_tpu.training.trainer import init_train_state, make_train_step


def _setup(batch_size=4):
    cfg = vc2.tiny_config()
    encoder = vc2.VideoChat2Encoder(cfg)
    decoder = Decoder(cfg.decoder)
    rng = jax.random.PRNGKey(0)
    t = cfg.vit.num_frames
    pixels = jax.random.normal(rng, (batch_size, t, 224, 224, 3)) * 0.1
    instr = jnp.tile(jnp.arange(6)[None], (batch_size, 1))
    pre_ids = jnp.tile(jnp.arange(4)[None], (batch_size, 1))
    post_ids = jnp.tile(jnp.arange(5)[None], (batch_size, 1))
    q = cfg.total_query_tokens
    # unequal answer lengths across rows: exposes wrong per-microbatch
    # mean-of-means weighting
    ans = np.tile(np.arange(5)[None], (batch_size, 1)).astype(np.int32)
    lab = np.concatenate([np.full((batch_size, 4 + q), -100, np.int32), ans], 1)
    lab[0, -3:] = -100
    if batch_size > 2:
        lab[2, -1:] = -100
    batch = {"pixels": pixels, "instruction_ids": instr, "pre_ids": pre_ids,
             "post_ids": post_ids, "labels": jnp.asarray(lab)}

    enc_params = encoder.init(jax.random.PRNGKey(1), pixels[:1],
                              encoder.init_states(1),
                              instruction_ids=instr[:1])["params"]
    dec_params = decoder.init(jax.random.PRNGKey(2), input_ids=pre_ids[:1])["params"]
    params = {"encoder": enc_params, "decoder": dec_params}
    tx = make_optimizer(cosine_warmup_schedule(1e-2, 2, 100))
    return encoder, decoder, params, tx, batch


def test_accumulated_step_matches_large_batch():
    encoder, decoder, params, tx, batch = _setup()
    rng = jax.random.PRNGKey(3)

    s1 = init_train_state(params, tx)
    step1 = jax.jit(make_train_step(encoder, decoder, tx))
    s1, m1 = step1(s1, batch, rng)

    s2 = init_train_state(params, tx)
    step2 = jax.jit(make_train_step(encoder, decoder, tx, accum_steps=2))
    s2, m2 = step2(s2, batch, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-5)
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s2.params)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-7, err_msg=str(p1))


def test_accum_steps_validation():
    encoder, decoder, params, tx, _ = _setup(batch_size=2)
    with pytest.raises(ValueError):
        make_train_step(encoder, decoder, tx, accum_steps=0)
    with pytest.raises(ValueError):
        make_train_step(encoder, decoder, tx, zero=True)  # zero needs a mesh
