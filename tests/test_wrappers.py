"""End-to-end wrapper tests (tiny configs): pipeline shapes, LTM streaming
semantics, baseline mode, jitted scan."""

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.models import infinite_videollama as ivl
from infinite_video_tpu.models import videochat2 as vc2
from infinite_video_tpu.runtime.streaming import stream_chunks, stream_mean_embedding


def _ivl_setup():
    cfg = ivl.tiny_config()
    model = ivl.InfVideoLLaMAEncoder(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 28, 28, 3)) * 0.3
    states = ivl.init_ltm_states(cfg.video_qformer, 1)
    params = model.init(jax.random.PRNGKey(0), pixels, states)["params"]
    return cfg, model, params, pixels


def test_infvideollama_chunk_step():
    cfg, model, params, pixels = _ivl_setup()
    states = ivl.init_ltm_states(cfg.video_qformer, 1)
    emb, states = model.apply({"params": params}, pixels, states)
    assert emb.shape == (1, cfg.num_video_query_token, cfg.decoder.hidden_size)
    assert len(states) == len(cfg.video_qformer.cross_layers)
    assert int(states[0].step) == 1
    assert np.isfinite(np.asarray(emb)).all()


def test_infvideollama_streaming_scan_jits():
    cfg, model, params, _ = _ivl_setup()
    chunks = jax.random.normal(jax.random.PRNGKey(2), (3, 1, 4, 28, 28, 3)) * 0.3

    @jax.jit
    def run(params, chunks):
        def enc(chunk, states, rng):
            return model.apply({"params": params}, chunk, states, ltm_rng=rng)
        return stream_mean_embedding(enc, ivl.init_ltm_states(cfg.video_qformer, 1),
                                     chunks)

    mean_emb, final_states = run(params, chunks)
    assert mean_emb.shape == (1, cfg.num_video_query_token, cfg.decoder.hidden_size)
    assert int(final_states[0].step) == 3
    assert np.isfinite(np.asarray(mean_emb)).all()


def test_infvideollama_ltm_changes_across_chunks():
    """With LTM on, re-encoding the same chunk twice gives different outputs
    (memory accumulates); with ltm_on=False the outputs are identical."""
    cfg, model, params, pixels = _ivl_setup()

    states = ivl.init_ltm_states(cfg.video_qformer, 1)
    emb1, states = model.apply({"params": params}, pixels, states)
    emb2, states = model.apply({"params": params}, pixels, states)
    assert np.abs(np.asarray(emb1) - np.asarray(emb2)).max() > 1e-6

    b1, _ = model.apply({"params": params}, pixels, (), ltm_on=False)
    b2, _ = model.apply({"params": params}, pixels, (), ltm_on=False)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def _vc2_setup():
    cfg = vc2.tiny_config()
    model = vc2.VideoChat2Encoder(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 224, 224, 3)) * 0.3
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 6)))
    states = vc2.init_ltm_states(cfg.qformer, 1)
    params = model.init(jax.random.PRNGKey(0), pixels, states,
                        instruction_ids=ids)["params"]
    return cfg, model, params, pixels, ids


def test_videochat2_chunk_step_with_instruction():
    cfg, model, params, pixels, ids = _vc2_setup()
    states = vc2.init_ltm_states(cfg.qformer, 1)
    emb, states = model.apply({"params": params}, pixels, states,
                              instruction_ids=ids)
    assert emb.shape == (1, cfg.total_query_tokens, cfg.decoder.hidden_size)
    assert int(states[0].step) == 1
    assert np.isfinite(np.asarray(emb)).all()


def test_videochat2_baseline_flag():
    cfg, model, params, pixels, ids = _vc2_setup()
    e1, _ = model.apply({"params": params}, pixels, (), instruction_ids=ids,
                        ltm_on=False)
    e2, _ = model.apply({"params": params}, pixels, (), instruction_ids=ids,
                        ltm_on=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_videochat2_hd_tiles_as_batch():
    cfg, model, params, _, ids = _vc2_setup()
    # 3 tiles (e.g. 2 spatial + 1 global thumbnail), 2 frames each
    tiles = jax.random.normal(jax.random.PRNGKey(9), (3, 2, 224, 224, 3)) * 0.3
    states = vc2.init_ltm_states(cfg.qformer, 3)
    out, states = model.apply({"params": params}, tiles, states,
                              instruction_ids=ids,
                              method=model.encode_hd)
    assert out.shape == (1, 3 * cfg.total_query_tokens, cfg.decoder.hidden_size)
    assert states[0].B.shape[0] == 3  # per-tile memories
    assert np.isfinite(np.asarray(out)).all()


def test_stream_until_breakpoint():
    from infinite_video_tpu.runtime.streaming import stream_until

    cfg, model, params, _ = _ivl_setup()
    chunks = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 28, 28, 3)) * 0.3

    def enc(chunk, states, rng):
        return model.apply({"params": params}, chunk, states, ltm_rng=rng)

    full, _ = stream_until(enc, ivl.init_ltm_states(cfg.video_qformer, 1),
                           chunks, jnp.asarray(4))
    half, _ = stream_until(enc, ivl.init_ltm_states(cfg.video_qformer, 1),
                           chunks, jnp.asarray(2))
    assert np.isfinite(np.asarray(half)).all()
    assert np.abs(np.asarray(full) - np.asarray(half)).max() > 1e-6


def test_alpha1_recipe_states_pass_through_scan():
    """alpha=1.0 (the README recipe) gates the LTM off; states must pass
    through unchanged so the streaming scan carry keeps its structure."""
    import dataclasses

    cfg = ivl.tiny_config()
    vq = dataclasses.replace(cfg.video_qformer, alpha=1.0)
    cfg = dataclasses.replace(cfg, video_qformer=vq)
    model = ivl.InfVideoLLaMAEncoder(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 28, 28, 3)) * 0.3
    states = ivl.init_ltm_states(cfg.video_qformer, 1)
    params = model.init(jax.random.PRNGKey(0), pixels, states)["params"]

    @jax.jit
    def run(params, chunks):
        def enc(chunk, states, rng):
            return model.apply({"params": params}, chunk, states, ltm_rng=rng)
        return stream_mean_embedding(enc, ivl.init_ltm_states(cfg.video_qformer, 1),
                                     chunks)

    chunks = jax.random.normal(jax.random.PRNGKey(2), (3, 1, 4, 28, 28, 3)) * 0.3
    emb, final_states = run(params, chunks)
    assert int(final_states[0].step) == 0  # untouched memory
    assert np.isfinite(np.asarray(emb)).all()


def test_two_phase_streaming_matches_fused_path():
    """Batched-ViT streaming (stream_two_phase) must equal the per-chunk full
    encode exactly — the ViT carries no cross-chunk state."""
    from infinite_video_tpu.runtime.streaming import stream_chunks, stream_two_phase

    cfg, model, params, _ = _ivl_setup()
    chunks = jax.random.normal(jax.random.PRNGKey(5), (3, 1, 4, 28, 28, 3)) * 0.3

    def enc_full(chunk, states, rng):
        return model.apply({"params": params}, chunk, states, ltm_rng=rng)

    ref_embs, ref_states = stream_chunks(
        enc_full, ivl.init_ltm_states(cfg.video_qformer, 1), chunks,
        jax.random.PRNGKey(7))

    def enc_frames(pixels):
        return model.apply({"params": params}, pixels,
                           method=model.encode_frames)

    def enc_chunk(frame_tokens, states, rng):
        return model.apply({"params": params}, frame_tokens, states,
                           ltm_rng=rng, method=model.encode_video_chunk)

    embs, states = stream_two_phase(
        enc_frames, enc_chunk, ivl.init_ltm_states(cfg.video_qformer, 1),
        chunks, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(embs), np.asarray(ref_embs),
                               rtol=1e-5, atol=1e-6)

    # macro-batched ViT path gives the same result
    embs2, _ = stream_two_phase(
        enc_frames, enc_chunk, ivl.init_ltm_states(cfg.video_qformer, 1),
        chunks, jax.random.PRNGKey(7), vit_macro_batch=2)
    np.testing.assert_allclose(np.asarray(embs2), np.asarray(ref_embs),
                               rtol=1e-5, atol=1e-6)
