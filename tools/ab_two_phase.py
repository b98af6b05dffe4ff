"""A/B: fused per-chunk scan vs two-phase (batched-ViT) encode, MATCHED
geometry.

Round-4 VERDICT (Weak #3): the engines' fused-scan default cited a round-3
number (222.5 vs 159.2 f/s) that round-4's corrected two-length timing
contradicted (237.0 fused-stream vs 266.61 two-phase-videos) — but those two
benches ran DIFFERENT geometries (32-chunk endless stream with one state
init vs 8-chunk videos with per-video re-init), so neither adjudicates the
engine default. This tool runs BOTH paths at BOTH geometries under identical
protocol — same chunk count, same per-video state re-init, same on-device
pixel generation, two-length differenced chain timing (bench._chain_fps) —
and prints a decision table.

The engine-shaped geometry is "eval video": stream_mean_embedding over C
chunks with a fresh LTMState per video (eval/engine.py _encode, matching
run_inference_inf_video_llama_nextqa.py:184-194). C=8 is the EgoSchema/
MovieChat chunking floor; C=32 covers long-video evals (the 256-chunk recipe
behaves like C=32 ViT-wise — the ViT phase is C-linear in both paths).

Run on a TPU runtime from the repo root:
    python tools/ab_two_phase.py [--chunks 8 32] [--chain 4]
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK_LEN = 8
NUM_BASIS = 256


def build(chunk_len=CHUNK_LEN):
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.models import infinite_videollama as ivl

    cfg = ivl.default_config(chunk_len=chunk_len, num_basis=NUM_BASIS,
                             alpha=0.5, sticky=True)
    encoder = ivl.InfVideoLLaMAEncoder(cfg)
    pixels0 = jnp.zeros((1, chunk_len, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(
        lambda: encoder.init(jax.random.PRNGKey(0), pixels0,
                             encoder.init_states(1),
                             ltm_rng=jax.random.PRNGKey(1))["params"])()
    return encoder, params


def video_fps(encoder, params, num_chunks: int, two_phase: bool,
              n_chain: int, vit_macro_batch: int = 0) -> float:
    """f/s over whole eval-protocol videos: C chunks, fresh state per video,
    mean embedding — the exact eval/engine.py _encode shape for both paths."""
    import jax
    import jax.numpy as jnp

    from bench import _chain_fps
    from infinite_video_tpu.runtime.streaming import (stream_mean_embedding,
                                                      stream_two_phase)

    @partial(jax.jit, static_argnames="n")
    def run(params, seed, n):
        def enc_full(chunk, states, key):
            return encoder.apply({"params": params}, chunk, states,
                                 ltm_rng=key)

        def enc_frames(pixels):
            return encoder.apply({"params": params}, pixels,
                                 method=encoder.encode_frames)

        def enc_chunk(tokens, states, key):
            return encoder.apply({"params": params}, tokens, states,
                                 ltm_rng=key,
                                 method=encoder.encode_video_chunk)

        def video(key, _):
            key, kd, kr = jax.random.split(key, 3)
            chunks = jax.random.normal(
                kd, (num_chunks, 1, CHUNK_LEN, 224, 224, 3),
                jnp.bfloat16) * 0.5
            if two_phase:
                embs, _ = stream_two_phase(
                    enc_frames, enc_chunk, encoder.init_states(1), chunks,
                    kr, vit_macro_batch=vit_macro_batch)
                emb = jnp.mean(embs, axis=0)
            else:
                emb, _ = stream_mean_embedding(
                    enc_full, encoder.init_states(1), chunks, kr)
            return key, emb.astype(jnp.float32).sum()

        _, sums = jax.lax.scan(video, jax.random.PRNGKey(seed), None,
                               length=n)
        return sums.sum()

    return _chain_fps(lambda s, n: run(params, s, n),
                      CHUNK_LEN * num_chunks, n_chain, trials=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--macro", type=int, default=0,
                    help="vit_macro_batch for the two-phase path "
                         "(0 = all frames in one ViT call)")
    args = ap.parse_args()

    encoder, params = build()
    print(f"{'geometry':>12} {'fused f/s':>10} {'two-phase f/s':>14} "
          f"{'winner':>10}")
    for c in args.chunks:
        fused = video_fps(encoder, params, c, False, args.chain)
        two = video_fps(encoder, params, c, True, args.chain,
                        vit_macro_batch=args.macro)
        win = "two-phase" if two > fused else "fused"
        pct = 100.0 * abs(two - fused) / min(two, fused)
        print(f"{c:>4} chunks  {fused:>10.1f} {two:>14.1f} "
              f"{win:>10} (+{pct:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
