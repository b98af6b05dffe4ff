"""A/B: XLA einsum vs non-causal Pallas flash attention at the 16-frame UMT
ViT-L geometry (S = 16*196 = 3136, D=64, H=16 — the joint space-time
attention of infty-VideoChat2/models/blip2/vit.py:301-321).

This is the one ViT geometry the whole-row kernel (ops/pallas/
vit_attention.py) cannot take — fits_vmem fails at S=3136 (an fp32 [S,S]
score block alone is 39 MB) — so until round 5 the XLA einsums served it
unmeasured (round-4 VERDICT missing #3). The candidates:
  - "xla": the einsum path of models/vit.py ViTAttention.
  - "flash": ops/pallas/flash_attention.py with causal=False. Caveat named
    up front: D=64 pads to 128 lanes inside the kernel, doubling its issued
    FLOPs — the same pathology that sank the LTM fused kernel — so this A/B
    is a genuine question, not a formality.

Measures (two-length differenced chain timing, bench._chain_fps):
  1. the isolated attention op at [B=1, S=3136, H=16, D=64];
  2. the FULL UMT ViT-L 16-frame forward (the in-model number that decides
     ViTConfig.attn_impl="auto" routing for fits_vmem-failing geometries).

Run on a TPU runtime from the repo root:
    python tools/ab_umt_attention.py [--chain 32] [--model-chain 8]
"""

import argparse
import dataclasses
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def op_ms(impl: str, n_chain: int) -> float:
    """Isolated attention op latency (ms) at the UMT geometry; the output
    feeds the next step's queries (true dependency chain)."""
    import jax
    import jax.numpy as jnp

    from bench import _chain_fps
    from infinite_video_tpu.ops.pallas.flash_attention import flash_attention

    s, h, d = 3136, 16, 64

    def xla_attn(q, k, v):
        a = jnp.einsum("bqhd,bkhd->bhqk", q * (d ** -0.5), k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(a, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    @partial(jax.jit, static_argnames="n")
    def stream(seed, n):
        key = jax.random.PRNGKey(seed)
        kq, kk, kv = jax.random.split(key, 3)
        q0 = jax.random.normal(kq, (1, s, h, d), jnp.bfloat16)
        k_ = jax.random.normal(kk, (1, s, h, d), jnp.bfloat16)
        v_ = jax.random.normal(kv, (1, s, h, d), jnp.bfloat16)

        def step(q, _):
            out = (flash_attention(q, k_, v_, causal=False) if impl == "flash"
                   else xla_attn(q, k_, v_))
            out = out.astype(jnp.bfloat16)
            return out, out.astype(jnp.float32).sum()

        _, sums = jax.lax.scan(step, q0, None, length=n)
        return sums.sum()

    return 1000.0 / _chain_fps(stream, 1, n_chain)


def model_ms(impl: str, n_chain: int) -> float:
    """Full UMT ViT-L 16-frame forward latency (ms per chunk)."""
    import jax
    import jax.numpy as jnp

    from bench import _chain_fps
    from infinite_video_tpu.models.vit import (VisionTransformer,
                                               umt_vit_l_config)

    cfg = dataclasses.replace(umt_vit_l_config(num_frames=16,
                                               dtype=jnp.bfloat16),
                              attn_impl=impl)
    model = VisionTransformer(cfg)
    pixels0 = jnp.zeros((1, 16, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), pixels0)
                     ["params"])()

    @partial(jax.jit, static_argnames="n")
    def run(params, seed, n):
        def step(key, _):
            key, kd = jax.random.split(key)
            pixels = jax.random.normal(kd, (1, 16, 224, 224, 3),
                                       jnp.bfloat16) * 0.5
            out = model.apply({"params": params}, pixels)
            return key, out.astype(jnp.float32).sum()

        _, sums = jax.lax.scan(step, jax.random.PRNGKey(seed), None, length=n)
        return sums.sum()

    return 1000.0 / _chain_fps(lambda s, n: run(params, s, n), 1, n_chain,
                               trials=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument("--model-chain", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3,
                    help="paired repeats of the in-model measurement")
    args = ap.parse_args()

    print("isolated op [1, 3136, 16, 64] bf16:")
    for impl in ("xla", "flash"):
        print(f"  {impl:>6}: {op_ms(impl, args.chain):7.3f} ms", flush=True)

    print(f"full UMT ViT-L 16f forward ({args.runs} paired runs):")
    rows = []
    for r in range(args.runs):
        pair = {impl: model_ms(impl, args.model_chain)
                for impl in ("xla", "flash")}
        rows.append(pair)
        print(f"  run {r}: xla {pair['xla']:7.2f} ms   "
              f"flash {pair['flash']:7.2f} ms   "
              f"winner {'flash' if pair['flash'] < pair['xla'] else 'xla'}",
              flush=True)
    wins = sum(1 for p in rows if p["flash"] < p["xla"])
    print(f"flash wins {wins}/{len(rows)} paired in-model runs")


if __name__ == "__main__":
    main()
