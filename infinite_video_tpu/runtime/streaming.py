"""Streaming chunk loop: `lax.scan` with the LTM state as carry.

This is the TPU-native replacement for the reference's python-level chunk
loops (eval_code/eval/run_inference_inf_video_llama_nextqa.py:184-194,
eval_code/run_nextqa_mistral.py:141-152): the whole multi-chunk encode of a
video compiles to one XLA program with constant HBM footprint, and the
per-chunk embeddings are mean-pooled exactly as the eval protocol does.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["stream_chunks", "stream_mean_embedding", "stream_two_phase",
           "stream_until"]


def stream_chunks(
    encode_chunk: Callable,
    init_states,
    chunks: jnp.ndarray,          # [num_chunks, B, ...] stacked chunk inputs
    rng: Optional[jax.Array] = None,
):
    """Scan `encode_chunk(chunk, states, rng) -> (emb, states)` over chunks.

    Returns (per-chunk embeddings [num_chunks, ...], final states).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, chunk):
        states, key = carry
        key, sub = jax.random.split(key)
        emb, states = encode_chunk(chunk, states, sub)
        return (states, key), emb

    (final_states, _), embs = jax.lax.scan(step, (init_states, rng), chunks)
    return embs, final_states


def stream_mean_embedding(encode_chunk, init_states, chunks, rng=None):
    """Per-chunk encode + mean over chunks (the reference eval protocol:
    run_inference_inf_video_llama_nextqa.py:194, run_nextqa_mistral.py:152)."""
    embs, final_states = stream_chunks(encode_chunk, init_states, chunks, rng)
    return jnp.mean(embs, axis=0), final_states


def stream_two_phase(
    encode_frames: Callable,      # pixels [C*B, T, ...] -> frame tokens
    encode_chunk: Callable,       # (frame_tokens, states, rng) -> (emb, states)
    init_states,
    chunks: jnp.ndarray,          # [C, B, T, H, W, 3]
    rng: Optional[jax.Array] = None,
    vit_macro_batch: int = 0,     # frames-chunks per ViT call (0 = all at once)
):
    """Alternative streaming layout: the ViT has no cross-chunk state, so all
    chunks' frames are encoded in large batches first, and only the stateful
    LTM/video-Q-former scans sequentially.

    Equivalent output to stream_chunks(full encode). Measured at MATCHED
    geometry (tools/ab_two_phase.py, round 5 — same chunk count, per-video
    state re-init, two-length timing): two-phase wins short videos (C=8:
    269.8 vs 257.1 f/s at EVA-g geometry) and loses past a crossover
    between 8 and 16 chunks (C=16: 239.2 vs 252.8; C=32: 230.2 vs 253.1 —
    the C·B-frame macro-batch's activation footprint grows with C). The
    engines pick per chunk count at trace time (eval/engine.py _encode);
    `vit_macro_batch` bounds ViT memory when two-phase is forced on long
    videos. Earlier rounds' unmatched-geometry comparisons (r3 "222.5 vs
    159.2", r4 "237.0 vs 266.61") are superseded by this table.
    """
    c, b = chunks.shape[:2]
    flat = chunks.reshape((c * b,) + chunks.shape[2:])
    if vit_macro_batch and vit_macro_batch < c:
        # Full macro-batches scan under lax.map; the remainder gets its own
        # (statically-shaped) encode rather than zero-padding to a full macro
        # batch — padding would burn real ViT FLOPs on dead frames when
        # vit_macro_batch >> remainder.
        n_full = c // vit_macro_batch
        split = n_full * vit_macro_batch * b
        macro = flat[:split].reshape(
            (n_full, vit_macro_batch * b) + flat.shape[1:])
        tokens = jax.lax.map(encode_frames, macro)
        tokens = tokens.reshape((split,) + tokens.shape[2:])
        if split < c * b:
            tokens = jnp.concatenate([tokens, encode_frames(flat[split:])])
    else:
        tokens = encode_frames(flat)
    frame_tokens = tokens.reshape((c, b) + tokens.shape[1:])
    return stream_chunks(encode_chunk, init_states, frame_tokens, rng)


def stream_until(encode_chunk, init_states, chunks, num_valid, rng=None):
    """Breakpoint mode: encode all chunks but mean only the first `num_valid`
    (question asked at time t ⇒ memory/context from the video prefix only —
    MovieChat-style middle-video QA, infinityqa.py:233-236). `num_valid` may
    be traced, so one compilation serves every breakpoint."""
    embs, final_states = stream_chunks(encode_chunk, init_states, chunks, rng)
    idx = jnp.arange(embs.shape[0])
    mask = (idx < num_valid).astype(embs.dtype)
    mask = mask.reshape((-1,) + (1,) * (embs.ndim - 1))
    mean = (embs * mask).sum(0) / jnp.maximum(num_valid, 1)
    return mean, final_states
