"""Full-geometry single-chip serving smoke: the whole ∞-Video-LLaMA pipeline
on one v5e — EVA-g ViT (1.1B, bf16) + frame Q-former + LTM video Q-former +
int8 Vicuna-7B decode — answering one question end-to-end on random weights.

Validates on real hardware what the unit tests validate at tiny geometry:
every executable compiles, the whole model set fits one chip's 16 GB HBM
(vision ~2.4 GB bf16 + decoder ~7 GB int8 + caches), and the eval engine's
encode→prompt-splice→generate path produces tokens. Run from the repo root:

    python tools/smoke_e2e_tpu.py [--chunks 4] [--new-tokens 16]

Prints per-stage wall times and peak-ish memory telemetry. Random weights:
output text is noise by construction — the assertion is that the pipeline
runs, shapes agree, and nothing OOMs.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", type=int, default=4)
    p.add_argument("--chunk-len", type=int, default=8)
    p.add_argument("--new-tokens", type=int, default=16)
    args = p.parse_args()

    from infinite_video_tpu.eval.engine import LLaMAVideoQA
    from infinite_video_tpu.models import infinite_videollama as ivl
    from infinite_video_tpu.models.decoder import Decoder, llama7b_config
    from infinite_video_tpu.utils.testing import ToyTokenizer

    t0 = time.perf_counter()
    cfg = ivl.default_config(chunk_len=args.chunk_len, num_basis=256,
                             alpha=0.5, sticky=True)
    encoder = ivl.InfVideoLLaMAEncoder(cfg)
    pixels0 = jnp.zeros((1, args.chunk_len, 224, 224, 3), jnp.bfloat16)
    enc_params = jax.jit(
        lambda: encoder.init(jax.random.PRNGKey(0), pixels0,
                             encoder.init_states(1),
                             ltm_rng=jax.random.PRNGKey(1))["params"])()
    jax.block_until_ready(enc_params)
    print(f"[{time.perf_counter()-t0:7.1f}s] vision params initialised "
          f"({sum(x.size for x in jax.tree_util.tree_leaves(enc_params))/1e9:.2f}B)")

    dec_cfg = dataclasses.replace(llama7b_config(dtype=jnp.bfloat16),
                                  quantized=True)
    decoder = Decoder(dec_cfg)
    dec_params = jax.jit(
        lambda: decoder.init(jax.random.PRNGKey(2),
                             input_ids=jnp.zeros((1, 1), jnp.int32))["params"])()
    jax.block_until_ready(dec_params)
    print(f"[{time.perf_counter()-t0:7.1f}s] int8 7B decoder initialised")

    engine = LLaMAVideoQA(encoder, enc_params, decoder, dec_params,
                          ToyTokenizer(dec_cfg.vocab_size),
                          encoder.init_states)

    chunks = jax.random.normal(
        jax.random.PRNGKey(3),
        (args.chunks, 1, args.chunk_len, 224, 224, 3), jnp.bfloat16) * 0.5
    t1 = time.perf_counter()
    emb = engine.encode_video(chunks)
    jax.block_until_ready(emb)
    t2 = time.perf_counter()
    frames = args.chunks * args.chunk_len
    print(f"[{t2-t0:7.1f}s] encoded {frames} frames -> {emb.shape} "
          f"(encode {t2-t1:.1f}s incl. compile)")
    assert emb.shape == (1, cfg.num_video_query_token, dec_cfg.hidden_size)
    assert bool(jnp.isfinite(emb.astype(jnp.float32)).all())

    t3 = time.perf_counter()
    text = engine.answer(emb, "What happens in the video?",
                         max_new_tokens=args.new_tokens, do_sample=False)
    t4 = time.perf_counter()
    print(f"[{t4-t0:7.1f}s] generated {args.new_tokens} tokens "
          f"(prefill+decode {t4-t3:.1f}s incl. compile)")
    print(f"answer (random weights, expect noise): {text[:80]!r}")

    # warm repeat = honest serving latency (compiles cached)
    t5 = time.perf_counter()
    emb = engine.encode_video(chunks, rng=jax.random.PRNGKey(9))
    text = engine.answer(emb, "And now? Tell me more about it.",
                         max_new_tokens=args.new_tokens, do_sample=False)
    t6 = time.perf_counter()
    print(f"warm end-to-end: {t6-t5:.2f}s for {frames} frames + "
          f"{args.new_tokens} tokens")
    print("SMOKE OK")


if __name__ == "__main__":
    main()
