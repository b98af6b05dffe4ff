"""Ablate the quantized 7B b1 decode step on real hardware: where does the
non-weight floor go?

bench._decode_tok_s measures ~90.5 tok/s int8 (11.0 ms/step) and ~98 tok/s
int4 (10.2 ms/step) at batch 1. The int8 step is weight-streaming-bound
(7.2 GB / 819 GB/s ≈ 8.8 ms), but halving the stream to 3.6 GB (int4) only
bought 0.8 ms — so ~5.8 ms of non-weight work hides under the int8 stream
and becomes the int4 floor. This script decomposes that floor with the same
dependency-chain methodology as tools/profile_vit.py: each mode times one
jitted scan over the decode step with one component ablated (mock-patched
DecoderLayer subclasses, executables compiled INSIDE the patch context), so
(full - ablated) isolates that component.

Modes:
  - full            : the real decode step (models/decoder.py), int4 weights
  - no-kv-attention : scores/softmax/ctx replaced by a v-passthrough (cache
                      writes kept — isolates the attention read + softmax)
  - no-norms        : RMSNorm -> identity (isolates the 65 fp32 norms)
  - no-rope         : rotary embedding -> identity
  - weights-only    : bare chain of the step's QuantDense matmuls at row=1
                      (the weight-streaming roofline for the same bytes)

Run from the repo root on a TPU runtime:
    python tools/profile_decode.py [--bits 4|8] [--context 257|8192]
Results recorded in docs/KERNELS.md §3b.
"""

import argparse
import dataclasses
import os
import sys
import time
from functools import partial
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from infinite_video_tpu.models import decoder as dec_mod
from infinite_video_tpu.models.decoder import (Decoder, init_kv_cache,
                                               mistral7b_config)


def timed(name, stream, n, gbytes=None):
    from chain_timing import two_len_time

    per = two_len_time(stream, n)
    line = f"{name:22s} {per*1e3:8.3f} ms/step  {1.0/per:7.1f} tok/s"
    if gbytes:
        line += f"  {gbytes/per:6.1f} GB/s effective"
    print(line, flush=True)
    return per


class _NoAttnLayer(dec_mod.DecoderLayer):
    """Projections, cache writes, norms, MLP kept; the attention read
    (score einsum + softmax + ctx einsum) replaced by a v passthrough."""

    @dec_mod.nn.compact
    def __call__(self, x, positions, mask_bias, cache_k, cache_v, cache_pos,
                 cache_k_scale=None, cache_v_scale=None):
        cfg = self.cfg
        h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        dense = dec_mod._dense_cls(cfg)
        res = x
        y = dec_mod.RMSNorm(cfg.rms_eps, name="input_ln")(x)
        if cfg.fused_proj:
            qkv = dense((h + 2 * kv) * hd, name="qkv_proj")(y)
            q, k, v = jnp.split(qkv, [h * hd, (h + kv) * hd], axis=-1)
        else:
            q = dense(h * hd, name="q_proj")(y)
            k = dense(kv * hd, name="k_proj")(y)
            v = dense(kv * hd, name="v_proj")(y)
        b, s, _ = y.shape
        q = dec_mod._rope(q.reshape(b, s, h, hd), positions, cfg.rope_theta)
        k = dec_mod._rope(k.reshape(b, s, kv, hd), positions, cfg.rope_theta)
        v = v.reshape(b, s, kv, hd)
        if cache_k is not None:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k.astype(cache_k.dtype), (0, cache_pos, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v.astype(cache_v.dtype), (0, cache_pos, 0, 0))
        # ctx <- v tiled to all query heads; q folded in so it isn't DCE'd
        ctx = (jnp.repeat(v, h // kv, axis=2) + 1e-6 * q).reshape(b, s, h * hd)
        attn_out = dense(cfg.hidden_size, name="o_proj")(ctx.astype(cfg.dtype))
        x = res + attn_out
        res = x
        y = dec_mod.RMSNorm(cfg.rms_eps, name="post_ln")(x)
        gate = dense(cfg.intermediate_size, name="gate_proj")(y)
        up = dense(cfg.intermediate_size, name="up_proj")(y)
        y = dense(cfg.hidden_size, name="down_proj")(jax.nn.silu(gate) * up)
        return res + y, cache_k, cache_v, cache_k_scale, cache_v_scale


class _IdNorm(dec_mod.nn.Module):
    eps: float

    @dec_mod.nn.compact
    def __call__(self, x):
        w = self.param("weight", dec_mod.nn.initializers.ones,
                       (x.shape[-1],))
        return x + 0.0 * w.astype(x.dtype)  # keep the param, drop the math


def decode_stream(cfg, *, prefill, n_steps, patches=()):
    """Jitted prefill + n_steps decode scan (bench._decode_tok_s shape),
    compiled inside the patch context."""
    model = Decoder(cfg)
    max_len = prefill + n_steps + 1

    with _ctx(patches):
        params = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0),
                               input_ids=jnp.zeros((1, 1),
                                                   jnp.int32))["params"])()

        @partial(jax.jit, static_argnames="n")
        def run(params, seed, n):
            emb = jax.random.normal(jax.random.PRNGKey(seed),
                                    (1, prefill, cfg.hidden_size),
                                    jnp.bfloat16)
            mask = jnp.zeros((1, max_len)).at[:, :prefill].set(1.0)
            cache = init_kv_cache(cfg, 1, max_len)
            logits, cache = model.apply({"params": params},
                                        inputs_embeds=emb,
                                        attention_mask=mask, cache=cache)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

            def step(carry, t):
                tok, cache, mask = carry
                mask = mask.at[:, prefill + t].set(1.0)
                logits, cache = model.apply({"params": params},
                                            input_ids=tok[:, None],
                                            attention_mask=mask, cache=cache)
                tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (tok, cache, mask), logits[:, -1, 0]

            (_, _, _), outs = jax.lax.scan(step, (tok, cache, mask),
                                           jnp.arange(n))
            return outs.sum()

        # compile BOTH two-length chain lengths inside the patches
        float(run(params, 0, n_steps))
        float(run(params, 1, max(1, n_steps // 5)))
    return lambda seed, n: run(params, seed, n)


def weights_only_stream(cfg):
    """Chain of exactly the decode step's projection matmuls at row=1 —
    same quantized bytes, zero attention/norm/cache work."""
    from infinite_video_tpu.models.decoder import QuantDense

    h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    d, mi = cfg.hidden_size, cfg.intermediate_size
    qd = partial(QuantDense, dtype=cfg.dtype, bits=cfg.quant_bits,
                 group=cfg.quant_group)

    class _Stack(dec_mod.nn.Module):
        @dec_mod.nn.compact
        def __call__(self, x):
            for i in range(cfg.num_layers):
                y = qd((h + 2 * kv) * hd, name=f"qkv{i}")(x)[:, :d]
                x = x + qd(d, name=f"o{i}")(y)
                g = qd(mi, name=f"gate{i}")(x)
                u = qd(mi, name=f"up{i}")(x)
                x = x + qd(d, name=f"down{i}")(g * u)
            return qd(cfg.vocab_size, name="head")(x)[:, :d]

    model = _Stack()
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, d), jnp.bfloat16))["params"])()

    @partial(jax.jit, static_argnames="n")
    def run(params, seed, n):
        def step(x, _):
            out = model.apply({"params": params}, x)
            return out.astype(jnp.bfloat16), out.astype(jnp.float32).sum()

        x0 = jax.random.normal(jax.random.PRNGKey(seed), (1, d), jnp.bfloat16)
        _, sums = jax.lax.scan(step, x0, None, length=n)
        return sums.sum()

    return lambda seed, n: run(params, seed, n)


class _ctx:
    def __init__(self, patches):
        self.patches = patches

    def __enter__(self):
        for p in self.patches:
            p.__enter__()

    def __exit__(self, *a):
        for p in reversed(self.patches):
            p.__exit__(*a)


def step_gbytes(cfg) -> float:
    """Quantized weight bytes streamed per decode step."""
    h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    d, mi = cfg.hidden_size, cfg.intermediate_size
    per_layer = d * ((h + 2 * kv) * hd + 3 * mi) + h * hd * d
    total = cfg.num_layers * per_layer + d * cfg.vocab_size
    return total * (0.5 if cfg.quant_bits == 4 else 1.0) / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=(4, 8))
    ap.add_argument("--context", type=int, default=257,
                    help="prefill+decode context (bench geometry = 257)")
    ap.add_argument("--kv-int8", action="store_true")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)

    prefill = max(args.context - 129, 8)
    n = 128
    # fused qkv = the bench/serving layout (cli/run_eval._maybe_quantize)
    cfg = dataclasses.replace(mistral7b_config(), quantized=True,
                              fused_proj=True, quant_bits=args.bits,
                              kv_quant=args.kv_int8)
    gb = step_gbytes(cfg)
    print(f"int{args.bits} 7B, prefill={prefill}, {n} decode steps, "
          f"{gb:.2f} GB weights/step", flush=True)

    timed("weights-only roofline", weights_only_stream(cfg), n, gb)
    full = timed("full decode step",
                 decode_stream(cfg, prefill=prefill, n_steps=n), n, gb)
    timed("no-kv-attention",
          decode_stream(cfg, prefill=prefill, n_steps=n, patches=(
              mock.patch.object(dec_mod, "DecoderLayer", _NoAttnLayer),)),
          n)
    timed("no-norms",
          decode_stream(cfg, prefill=prefill, n_steps=n, patches=(
              mock.patch.object(dec_mod, "RMSNorm", _IdNorm),)),
          n)
    print(f"(full = {full*1e3:.2f} ms; component cost = full - ablated)",
          flush=True)


if __name__ == "__main__":
    main()
