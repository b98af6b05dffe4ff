"""HD stage-4 training path: collate_hd_batch + hd_loss_parts + train step.

Mirrors videochat2_it_hd_mistral.py training semantics with TPU static
shapes: tiles padded to a fixed max_tiles, padded tiles masked out of decoder
attention and inert to the loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from infinite_video_tpu.data.datasets import mistral_conversation_text
from infinite_video_tpu.training.collate import collate_hd_batch
from infinite_video_tpu.utils.testing import ToyTokenizer


def _sample(rng, h, w, t=2, answer="a square"):
    frames = (rng.random((t, h, w, 3)) * 255).astype(np.uint8)
    conv = mistral_conversation_text([{"q": "what is it?", "a": answer}])
    return frames, conv, "watch carefully"


def test_collate_hd_batch_shapes_and_masks():
    rng = np.random.default_rng(0)
    tok = ToyTokenizer(128)
    q = 4
    # landscape and portrait samples with different tile counts
    samples = [_sample(rng, 64, 128), _sample(rng, 128, 64)]
    batch = collate_hd_batch(samples, tok, num_query_tokens=q, hd_num=6,
                             image_size=32)
    m = 7  # hd_num + global thumbnail
    assert batch["pixels"].shape[0] == 2 and batch["pixels"].shape[1] == m
    assert batch["pixels"].shape[2] == 2  # T preserved
    assert batch["pixels"].shape[3:] == (32, 32, 3)
    assert batch["tile_mask"].shape == (2, m)
    counts = batch["tile_mask"].sum(axis=1)
    assert counts.min() >= 2  # at least one local tile + the global view
    assert counts.max() <= m
    # padded tiles are exactly zero
    for b in range(2):
        for i in range(m):
            if batch["tile_mask"][b, i] == 0:
                assert np.all(batch["pixels"][b, i] == 0)
    # label row spans pre + m*Q video positions + post
    want = batch["pre_ids"].shape[1] + m * q + batch["post_ids"].shape[1]
    assert batch["labels"].shape == (2, want)
    # video positions are all -100; some answer labels survive
    pre_w = batch["pre_ids"].shape[1]
    assert (batch["labels"][:, pre_w:pre_w + m * q] == -100).all()
    assert (batch["labels"] != -100).sum() > 0
    # portrait/landscape of the same content tile to the same count (flip)
    assert counts[0] == counts[1]


def _tiny_models():
    from infinite_video_tpu.models import videochat2 as vc2
    from infinite_video_tpu.models.decoder import Decoder

    cfg = vc2.tiny_config()
    return cfg, vc2.VideoChat2Encoder(cfg), Decoder(cfg.decoder)


def _hd_batch(cfg, rng_np, b=1, m=2, real=1):
    t = cfg.vit.num_frames
    q = cfg.total_query_tokens
    pixels = np.zeros((b, m, t, 224, 224, 3), np.float32)
    pixels[:, :real] = rng_np.normal(size=(b, real, t, 224, 224, 3)) * 0.2
    tile_mask = np.zeros((b, m), np.float32)
    tile_mask[:, :real] = 1.0
    pre = np.tile(np.arange(1, 4)[None], (b, 1))
    post = np.tile(np.arange(4, 9)[None], (b, 1))
    labels = np.concatenate([
        np.full((b, 3 + m * q), -100, np.int64),
        np.tile(np.arange(4, 9)[None], (b, 1)),
    ], axis=1)
    return {
        "pixels": jnp.asarray(pixels),
        "tile_mask": jnp.asarray(tile_mask),
        "pre_ids": jnp.asarray(pre, jnp.int32),
        "post_ids": jnp.asarray(post, jnp.int32),
        "pre_mask": jnp.ones((b, 3), jnp.float32),
        "post_mask": jnp.ones((b, 5), jnp.float32),
        "labels": jnp.asarray(labels),
        "instruction_ids": jnp.tile(jnp.arange(3)[None], (b, 1)).astype(jnp.int32),
        "instruction_mask": jnp.ones((b, 3), jnp.float32),
    }


def test_hd_loss_padded_tiles_inert():
    """Perturbing a masked tile's pixels must not change the loss."""
    from infinite_video_tpu.training.trainer import hd_loss_parts

    cfg, encoder, decoder = _tiny_models()
    rng_np = np.random.default_rng(1)
    batch = _hd_batch(cfg, rng_np, b=1, m=2, real=1)

    enc_params = encoder.init(
        jax.random.PRNGKey(0),
        batch["pixels"][:, 0], encoder.init_states(1),
        instruction_ids=batch["instruction_ids"])["params"]
    dec_params = decoder.init(jax.random.PRNGKey(1),
                              input_ids=batch["pre_ids"])["params"]
    params = {"encoder": enc_params, "decoder": dec_params}

    def loss_of(batch):
        s, c = hd_loss_parts(encoder, decoder, params, batch,
                             jax.random.PRNGKey(2))
        return float(s / c)

    base = loss_of(batch)
    assert np.isfinite(base)
    poked = dict(batch)
    poked["pixels"] = batch["pixels"].at[:, 1].set(7.7)  # masked tile
    assert loss_of(poked) == base
    # ...but a real tile's pixels do matter
    poked2 = dict(batch)
    poked2["pixels"] = batch["pixels"].at[:, 0].add(0.5)
    assert loss_of(poked2) != base


def test_hd_train_step_end_to_end():
    from infinite_video_tpu.training.trainer import (init_train_state,
                                                     make_train_step)

    cfg, encoder, decoder = _tiny_models()
    rng_np = np.random.default_rng(2)
    batch = _hd_batch(cfg, rng_np, b=2, m=2, real=2)

    enc_params = encoder.init(
        jax.random.PRNGKey(0), batch["pixels"][:, 0],
        encoder.init_states(2),
        instruction_ids=batch["instruction_ids"])["params"]
    dec_params = decoder.init(jax.random.PRNGKey(1),
                              input_ids=batch["pre_ids"])["params"]
    params = {"encoder": enc_params, "decoder": dec_params}
    tx = optax.adam(1e-3)
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(encoder, decoder, tx, hd=True))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
