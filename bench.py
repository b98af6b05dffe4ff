"""Benchmarks: LTM hot path (both reference recipe geometries), E2E vision
encode, and the Pallas flash-attention kernel — one JSON line.

Primary metric (matches round-1 BENCH): the novel consolidate+attend hot path
(SURVEY §3.3) at the EgoSchema recipe geometry — N=256 bases, 8-frame chunks,
512 sticky resamples, 1000 integration points, batch 1, 768-wide keys with 12
heads — streaming chunks through `ltm_attend` under one jitted lax.scan.
`extra` carries:
  - ltm_nextqa_*: the NExT-QA recipe geometry (max_int=256 → 256-frame
    chunks, README.md:39) whose G_inf is [768, 256] — a different regime;
  - e2e_vision_frames_per_sec: full ∞-Video-LLaMA vision path (EVA-g 1.1B +
    12-layer frame Q-former + LTM video Q-former, bf16) — TPU only;
  - flash_attention_ms / xla_attention_ms at S=2048/H=32/D=128 bf16 — TPU only.

Baseline: the reference torch implementation of the same LTM computation on
CPU (LongTermAttention driven method-by-method in forward order,
long_term_attention_gibbs.py:288-318, skipping only the debug density pickle
at :320-345).

All timings use readback-synchronised chains: on tunneled TPU runtimes
`block_until_ready` can return before remote execution finishes and identical
(executable, inputs) dispatches may be served from a relay cache, so (a)
every trial uses a fresh seed, (b) the computation is a true dependency
chain, (c) a scalar readback synchronises, and (d) every chain is timed at
TWO lengths (n//5 and n) and differenced — the fixed dispatch+readback
latency cancels exactly. Round 4 switched from floor subtraction to
two-length differencing after observing the relay's floor swing 28-412 ms
between sessions (larger than some whole chains, corrupting short-chain
metrics in either direction). Two executables per metric — remote compiles
are the wall-clock cost (observed 5 s—2 min per executable).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N,
   "extra": {...}}
"""

import json
import os
import sys
import time

import jax as _jax

NUM_BASIS = 256
TOKENS_PER_FRAME = 32
STICKY = True
ON_TPU = _jax.default_backend() == "tpu"
# Fused Pallas integral kernel (ops/pallas/ltm_fused.py): under honest
# chain timing the XLA path wins at this geometry (105 vs 112 us full chunk
# step on v5e) — the kernel pads head_dim 64->128, doubling its kpsi FLOPs,
# and the fp32 step is compute-bound (see docs/KERNELS.md). Round-1's
# "60 vs 72 us" was flattered by the remote-relay result cache.
USE_PALLAS = False


def _chain_fps(stream, frames_per_step: int, n: int, trials: int = 3) -> float:
    """Two-length differenced chain timing: stream(seed, n) -> scalar
    (jitted, n static). Times the chain at n//5 and at n in the same trial
    and uses (t_n - t_short)/(n - n_short) — the fixed dispatch+readback
    latency cancels exactly. Round-3 used floor subtraction with a floor
    measured once per process; the relay's floor was then observed to swing
    28-412 ms BETWEEN sessions, larger than some whole chains, so the
    subtraction could corrupt short-chain metrics either way. The price is
    one extra executable per metric (the n//5 chain)."""
    n_short = max(1, n // 5)
    float(stream(999, n))        # compile long
    float(stream(998, n_short))  # compile short
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        float(stream(7000 * n + t, n_short))
        t1 = time.perf_counter()
        float(stream(1000 * n + t, n))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n - n_short))
    per_step = max(best, 1e-9)
    return frames_per_step / per_step


def _ltm_fps(chunk_len: int, n_chain: int, fast_math: bool = False,
             batch: int = 1) -> float:
    """Streaming ltm_attend throughput, chunks generated on-device inside the
    scan body from the carried PRNG key (no host-side data in the chain).
    fast_math: the bf16-MXU serving mode (prefers the XLA path over the
    fp32-internal Pallas kernel — see ops/ltm.py). batch>1 streams that many
    independent videos in one scan (aggregate serving throughput: the small
    consolidation matmuls amortise their launch/pipeline overheads)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.ops import ltm

    cfg = ltm.LTMConfig(num_basis=NUM_BASIS, chunk_len=chunk_len,
                        tokens_per_frame=TOKENS_PER_FRAME, feature_dim=768,
                        hidden_size=768, num_heads=12, tau=0.75, sticky=STICKY,
                        fast_math=fast_math,
                        use_pallas=USE_PALLAS and not fast_math)
    rng = jax.random.PRNGKey(0)
    kp, kv, kq = jax.random.split(rng, 3)
    params = {
        "key": {"kernel": jax.random.normal(kp, (768, 768)) * 0.02,
                "bias": jnp.zeros(768)},
        "value": {"kernel": jax.random.normal(kv, (768, 768)) * 0.02,
                  "bias": jnp.zeros(768)},
    }
    queries = jax.random.normal(kq, (batch, 32, 768)) * 0.5

    @partial(jax.jit, static_argnames="n")
    def stream(seed, n):
        def step(carry, _):
            state, key = carry
            key, sub, kd = jax.random.split(key, 3)
            chunk = jax.random.normal(
                kd, (batch, chunk_len * TOKENS_PER_FRAME, 768)) * 0.5
            ctx, state = ltm.ltm_attend(cfg, params, state, chunk, queries, sub)
            return (state, key), ctx.sum()

        init = (ltm.init_state(cfg, batch), jax.random.PRNGKey(seed))
        (_, _), sums = jax.lax.scan(step, init, None, length=n)
        return sums.sum()

    return _chain_fps(stream, chunk_len * batch, n_chain)


def _torch_baseline_fps(chunk_len: int, n_chunks: int) -> float:
    """Reference LongTermAttention on torch-CPU, forward order sans debug dump."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import torch
    from gen_golden_ltm import load_reference_ltm, make_ltm

    mod = load_reference_ltm()
    torch.manual_seed(0)
    proj_key = torch.nn.Linear(768, 768)
    proj_value = torch.nn.Linear(768, 768)
    ltm_ref = make_ltm(mod, NUM_BASIS, 0.75, STICKY, proj_key, proj_value)
    q = torch.randn(1, 32, 768) * 0.5
    chunks = [torch.randn(1, chunk_len * TOKENS_PER_FRAME, 768) * 0.5
              for _ in range(n_chunks)]

    def chunk_step(ltm_self, k, new_doc):
        # forward body (gibbs:288-318) via the reference's own methods,
        # skipping only the debug pickle tail (gibbs:320-345).
        ltm_self.device = k.device  # gibbs:289
        klen = int(k.size(1) / 32)
        ltm_self.length = klen
        batch_size, qlen = k.size(0), q.size(1)
        ltm_self.qlen, ltm_self.batch_size = qlen, q.size(0)
        ltm_self.d_head = ltm_self.head_size
        ltm_self.get_basis(klen, klen)
        if new_doc:
            ltm_self.B_past = None
            ltm_self.x_past = None
        kk = k.reshape(batch_size, klen, 32, 768).mean(dim=2).transpose(1, 2)
        B = ltm_self.update_inf(kk)
        keys = ltm_self.proj_key(B)
        values = ltm_self.proj_value(B)
        ltm_self.queries = q.view(batch_size, qlen, 12, 64).transpose(1, 2)
        ltm_self.keys = keys.view(batch_size, NUM_BASIS, 12, 64).transpose(1, 2)
        ltm_self.values = values.view(batch_size, NUM_BASIS, 12, 64).transpose(1, 2)
        return ltm_self.expected_value(ltm_self.score)

    with torch.no_grad():
        for i, ch in enumerate(chunks[:2]):  # warm caches
            chunk_step(ltm_ref, ch, i == 0)
        t0 = time.perf_counter()
        for i, ch in enumerate(chunks):
            chunk_step(ltm_ref, ch, i == 0)
        dt = time.perf_counter() - t0
    return len(chunks) * chunk_len / dt


def _e2e_vision_fps(chunk_len: int = 8, n_chain: int = 32,
                    batch: int = 1) -> float:
    """Full ∞-Video-LLaMA vision path at real geometry (EVA-g 1.1B + 12-layer
    frame Q-former + 2-layer LTM video Q-former + llama_proj), bf16, one
    jitted scan with the LTM state as carry. Pixels drawn on-device.
    batch>1 = that many videos streaming concurrently (aggregate f/s)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.models import infinite_videollama as ivl

    cfg = ivl.default_config(chunk_len=chunk_len, num_basis=NUM_BASIS,
                             alpha=0.5, sticky=STICKY)
    encoder = ivl.InfVideoLLaMAEncoder(cfg)
    pixels0 = jnp.zeros((1, chunk_len, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(
        lambda: encoder.init(jax.random.PRNGKey(0), pixels0,
                             encoder.init_states(1),
                             ltm_rng=jax.random.PRNGKey(1))["params"])()

    # params MUST be a traced argument: closing over the 1.1B-param tree
    # would bake it into the HLO as constants (observed: >25 GB host RSS and
    # an unbounded constant-folding compile).
    @partial(jax.jit, static_argnames="n")
    def run(params, seed, n):
        def step(carry, _):
            states, key = carry
            key, sub, kd = jax.random.split(key, 3)
            pixels = jax.random.normal(
                kd, (batch, chunk_len, 224, 224, 3), jnp.bfloat16) * 0.5
            emb, states = encoder.apply({"params": params}, pixels, states,
                                        ltm_rng=sub)
            return (states, key), emb.astype(jnp.float32).sum()

        init = (encoder.init_states(batch), jax.random.PRNGKey(seed))
        (_, _), sums = jax.lax.scan(step, init, None, length=n)
        return sums.sum()

    def stream(seed, n):
        return run(params, seed, n)

    return _chain_fps(stream, chunk_len * batch, n_chain, trials=2)


def _e2e_videochat2_fps(chunk_len: int = 16, n_chain: int = 16) -> float:
    """Full ∞-VideoChat2 vision path at the README.md:60 NExT-QA recipe
    geometry: UMT ViT-L 16-frame joint space-time attention (S=3136 — the
    fits_vmem-failing geometry served by the flash route of ViTAttention) +
    12-layer LTM Q-former (num_basis=64, cross_attention_freq=2, text
    instruction input) + mistral_proj, bf16 ViT / fp32 Q-former. One jitted
    scan with the LTM state as carry; pixels drawn on-device. This is the
    second flagship's e2e number (round-4 VERDICT missing #3)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.models import videochat2 as vc2

    cfg = vc2.default_config(chunk_len=chunk_len, num_frames=chunk_len,
                             num_basis=64, alpha=1.0, sticky=STICKY)
    encoder = vc2.VideoChat2Encoder(cfg)
    pixels0 = jnp.zeros((1, chunk_len, 224, 224, 3), jnp.bfloat16)
    instr = jnp.ones((1, 24), jnp.int32)       # fixed-length instruction
    imask = jnp.ones((1, 24), jnp.float32)
    params = jax.jit(
        lambda: encoder.init(jax.random.PRNGKey(0), pixels0,
                             encoder.init_states(1),
                             instruction_ids=instr, instruction_mask=imask,
                             ltm_rng=jax.random.PRNGKey(1))["params"])()

    @partial(jax.jit, static_argnames="n")
    def run(params, seed, n):
        def step(carry, _):
            states, key = carry
            key, sub, kd = jax.random.split(key, 3)
            pixels = jax.random.normal(
                kd, (1, chunk_len, 224, 224, 3), jnp.bfloat16) * 0.5
            emb, states = encoder.apply({"params": params}, pixels, states,
                                        instruction_ids=instr,
                                        instruction_mask=imask, ltm_rng=sub)
            return (states, key), emb.astype(jnp.float32).sum()

        init = (encoder.init_states(1), jax.random.PRNGKey(seed))
        (_, _), sums = jax.lax.scan(step, init, None, length=n)
        return sums.sum()

    return _chain_fps(lambda s, n: run(params, s, n), chunk_len, n_chain,
                      trials=2)


def _e2e_two_phase_fps(chunk_len: int = 8, num_chunks: int = 8,
                       n_chain: int = 4) -> float:
    """The engines' actual encode path (eval/engine.py): all chunks' frames
    batch through the stateless ViT first, then the LTM video Q-former scans
    (runtime/streaming.py::stream_two_phase). Chain unit = one whole
    num_chunks-chunk video; fresh pixels per video from the seed."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.models import infinite_videollama as ivl
    from infinite_video_tpu.runtime.streaming import stream_two_phase

    cfg = ivl.default_config(chunk_len=chunk_len, num_basis=NUM_BASIS,
                             alpha=0.5, sticky=STICKY)
    encoder = ivl.InfVideoLLaMAEncoder(cfg)
    pixels0 = jnp.zeros((1, chunk_len, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(
        lambda: encoder.init(jax.random.PRNGKey(0), pixels0,
                             encoder.init_states(1),
                             ltm_rng=jax.random.PRNGKey(1))["params"])()

    @partial(jax.jit, static_argnames="n")
    def run(params, seed, n):
        def enc_frames(pixels):
            return encoder.apply({"params": params}, pixels,
                                 method=encoder.encode_frames)

        def enc_chunk(tokens, states, key):
            return encoder.apply({"params": params}, tokens, states,
                                 ltm_rng=key,
                                 method=encoder.encode_video_chunk)

        def video(carry, _):
            key = carry
            key, kd, kr = jax.random.split(key, 3)
            chunks = jax.random.normal(
                kd, (num_chunks, 1, chunk_len, 224, 224, 3), jnp.bfloat16) * 0.5
            embs, _ = stream_two_phase(enc_frames, enc_chunk,
                                       encoder.init_states(1), chunks, kr)
            return key, embs.astype(jnp.float32).sum()

        _, sums = jax.lax.scan(video, jax.random.PRNGKey(seed), None, length=n)
        return sums.sum()

    return _chain_fps(lambda s, n: run(params, s, n),
                      chunk_len * num_chunks, n_chain, trials=2)


def _attention_ms(use_flash: bool, s: int = 2048, h: int = 32, d: int = 128,
                  n_chain: int = 512) -> float:
    """Per-call latency of causal attention at LLM-context geometry; the
    output feeds the next step's queries (true dependency chain)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.ops.pallas.flash_attention import flash_attention

    def xla_attn(q, k, v):
        qf = q.astype(jnp.float32) / (d ** 0.5)
        z = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32))
        mask = jnp.tril(jnp.ones((s, s), bool))
        z = jnp.where(mask[None, None], z, -1e30)
        p = jax.nn.softmax(z, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))

    @partial(jax.jit, static_argnames="n")
    def stream(seed, n):
        key = jax.random.PRNGKey(seed)
        kq, kk, kv = jax.random.split(key, 3)
        q0 = jax.random.normal(kq, (1, s, h, d), jnp.bfloat16)
        k_ = jax.random.normal(kk, (1, s, h, d), jnp.bfloat16)
        v_ = jax.random.normal(kv, (1, s, h, d), jnp.bfloat16)

        def step(q, _):
            out = (flash_attention(q, k_, v_, causal=True) if use_flash
                   else xla_attn(q, k_, v_))
            out = out.astype(jnp.bfloat16)
            return out, out.astype(jnp.float32).sum()

        _, sums = jax.lax.scan(step, q0, None, length=n)
        return sums.sum()

    fps = _chain_fps(stream, 1, n_chain)  # steps/sec
    return 1000.0 / fps


def _decode_tok_s(batch: int = 1, prefill: int = 128, n_steps: int = 128,
                  quant_pallas=None, fused: bool = False,
                  fused_mlp: bool = False, bits: int = 8) -> float:
    """Steady-state autoregressive decode throughput of the int8 7B Mistral
    decoder (models/quantized.py serving path; modeling_llama_mem.py intent).
    Weight-only int8 keeps the 7B resident in a single v5e's HBM; weights are
    zeros (throughput is weight-streaming-bound, values are irrelevant) and
    the prefill embeddings are seed-fresh so the relay cannot replay."""
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.models.decoder import (Decoder, init_kv_cache,
                                                   mistral7b_config)

    cfg = dataclasses.replace(mistral7b_config(), quantized=True,
                              quant_pallas=quant_pallas, fused_proj=fused,
                              fused_mlp=fused_mlp, quant_bits=bits)
    model = Decoder(cfg)
    max_len = prefill + n_steps + 1
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           input_ids=jnp.zeros((1, 1), jnp.int32))["params"])()

    # params as a traced argument — closing over the 7B tree would bake it
    # into the HLO as constants (see _e2e_vision_fps).
    @partial(jax.jit, static_argnames="n")
    def run(params, seed, n):
        emb = jax.random.normal(jax.random.PRNGKey(seed),
                                (batch, prefill, cfg.hidden_size),
                                jnp.bfloat16)
        mask = jnp.zeros((batch, max_len)).at[:, :prefill].set(1.0)
        cache = init_kv_cache(cfg, batch, max_len)
        logits, cache = model.apply({"params": params}, inputs_embeds=emb,
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

    def stream(seed, n):
        return run(params, seed, n)

    return _chain_fps(stream, batch, n_steps, trials=2)


def _long_ctx_decode_tok_s(batch: int = 1, ctx: int = 8192,
                           n_steps: int = 64, kv_quant: bool = False,
                           bits: int = 8) -> float:
    """Long-session decode throughput: int8-weight 7B with the KV cache
    pre-filled to ctx - n_steps - 1 positions (random content, built on-device
    from the seed — throughput depends only on bytes streamed). This is where
    the int8 KV cache (DecoderConfig.kv_quant) earns its keep: at 8k context
    the bf16 KV read is ~0.13 GB/step/seq on top of the 7.2 GB weight stream,
    and at batch 8 the bf16 cache alone is 8.6 GB of HBM (capacity). Mirrors
    the modeling_llama_mem.py memory-efficiency intent at hour-long-chat
    geometry."""
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.models.decoder import (Decoder, KVCache,
                                                   mistral7b_config)

    cfg = dataclasses.replace(mistral7b_config(), quantized=True,
                              fused_proj=True, kv_quant=kv_quant,
                              quant_bits=bits)
    model = Decoder(cfg)
    kv, hd = cfg.num_kv_heads, cfg.head_dim
    fill = ctx - n_steps - 1
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           input_ids=jnp.zeros((1, 1), jnp.int32))["params"])()

    @jax.jit
    def build_cache(seed):
        # per-layer planes (models/decoder.py KVCache): keyed per layer so
        # contents differ across planes; planes are independent jit leaves,
        # so donation aliases each through the decode loop
        key = jax.random.PRNGKey(seed)
        shape = (batch, ctx, kv, hd)
        n = cfg.num_layers

        def keys(tag):
            return [jax.random.fold_in(key, 1000 * tag + i)
                    for i in range(n)]

        if kv_quant:
            return KVCache(
                k=tuple(jax.random.randint(k_, shape, -127, 128, jnp.int8)
                        for k_ in keys(1)),
                v=tuple(jax.random.randint(k_, shape, -127, 128, jnp.int8)
                        for k_ in keys(2)),
                pos=jnp.asarray(fill, jnp.int32),
                k_scale=tuple(jax.random.uniform(k_, shape[:-1], jnp.float32,
                                                 0.005, 0.02)
                              for k_ in keys(3)),
                v_scale=tuple(jax.random.uniform(k_, shape[:-1], jnp.float32,
                                                 0.005, 0.02)
                              for k_ in keys(4)))
        return KVCache(
            k=tuple(jax.random.normal(k_, shape, cfg.dtype)
                    for k_ in keys(1)),
            v=tuple(jax.random.normal(k_, shape, cfg.dtype)
                    for k_ in keys(2)),
            pos=jnp.asarray(fill, jnp.int32))

    # The cache is built in its OWN jit call and donated into the timed step
    # (observed in round 4 on the then-stacked layout: fusing build+scan made
    # XLA materialize per-layer HLO temps that blew HBM at batch 8; the
    # separation also keeps the timed executable pure decode). Donation
    # aliases each cache plane in place — but ONLY if the final cache is
    # also an output (XLA aliases donated inputs to outputs; a scalar-only
    # return makes the donation unusable and the loop copies the cache).
    # The per-call build cost is length-independent so it cancels in the
    # two-length differencing.
    @partial(jax.jit, static_argnames="n", donate_argnums=(1,))
    def run(params, cache, n):
        mask = jnp.zeros((batch, ctx)).at[:, :fill].set(1.0)
        tok = jnp.full((batch,), 7, jnp.int32)

        def step(carry, t):
            tok, cache, mask = carry
            mask = mask.at[:, fill + t].set(1.0)
            logits, cache = model.apply({"params": params},
                                        input_ids=tok[:, None],
                                        attention_mask=mask, cache=cache)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (tok, cache, mask), logits[:, -1, 0]

        (_, cache, _), outs = jax.lax.scan(step, (tok, cache, mask),
                                           jnp.arange(n))
        return outs.sum(), cache

    def stream(s, n):
        # seed-freshness lives in build_cache: every timed dispatch of `run`
        # sees a never-before-seen cache, so the relay cannot replay
        cache = jax.block_until_ready(build_cache(s))
        out, _ = run(params, cache, n)
        return out

    return _chain_fps(stream, batch, n_steps, trials=2)


def _spec_decode_tok_s(prefill: int = 128, n_base: int = 16,
                       n_long: int = 144, k: int = 8):
    """Speculative (prompt-lookup) greedy decode on the int8 7B: tokens/s
    with an echo draft context (the lookup sweet spot — the context contains
    the continuation, as in re-generated phrases / extractive answers) and
    the plain-generate baseline through the same generate() path. Returns
    (plain_tok_s, spec_tok_s, accepted_per_step). Timing: same-seed long
    minus base run cancels fixed dispatch+readback; every timed dispatch is
    a fresh (executable, inputs) pair so the relay cannot replay."""
    import dataclasses
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from infinite_video_tpu.models.decoder import Decoder, mistral7b_config
    from infinite_video_tpu.runtime.generation import (GenerationConfig,
                                                       generate)

    cfg = dataclasses.replace(mistral7b_config(), quantized=True,
                              fused_proj=True)
    model = Decoder(cfg)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           input_ids=jnp.zeros((1, 1), jnp.int32))["params"])()

    def gcfg(n, spec):
        return GenerationConfig(max_new_tokens=n, do_sample=False,
                                eos_token_id=-1, pad_token_id=0,
                                spec_tokens=spec)

    def emb_for(seed):
        return jax.random.normal(jax.random.PRNGKey(seed),
                                 (1, prefill, cfg.hidden_size), jnp.bfloat16)

    def run(seed, n, spec, draft=None):
        emb = emb_for(seed)
        t0 = time.perf_counter()
        toks = np.asarray(generate(model, params, gcfg(n, spec),
                                   prompt_embeds=emb, draft_ids=draft))
        return time.perf_counter() - t0, toks

    # compile all four executables once (seed 100; its echo context warms
    # both spec ctx-shapes). Every TIMED dispatch below uses a seed never
    # dispatched to that executable before, so the relay cannot replay.
    _, warm_toks = run(100, n_long, 0)
    run(100, n_base, 0)
    run(100, n_long, k, draft=warm_toks[0])
    run(100, n_base, k, draft=warm_toks[0])

    plain = 0.0
    for seed in (11, 12):
        tb, _ = run(seed, n_base, 0)
        tl, _ = run(seed, n_long, 0)
        plain = max(plain, (n_long - n_base) / max(tl - tb, 1e-9))

    spec = 0.0
    acc = 0.0
    for seed in (21, 22):
        _, toks = run(seed, n_long, 0)          # echo for THIS prompt
        d = toks[0]
        tb, _ = run(seed, n_base, k, draft=d)
        tl, _ = run(seed, n_long, k, draft=d)
        spec = max(spec, (n_long - n_base) / max(tl - tb, 1e-9))
        _, stats = generate(model, params, gcfg(n_long, k),
                            prompt_embeds=emb_for(seed), draft_ids=d,
                            return_spec_stats=True)
        acc = max(acc, stats["committed"] / max(stats["verify_steps"], 1))
    return plain, spec, acc


def main():
    extra = {}

    fps = _ltm_fps(chunk_len=8, n_chain=4096)
    try:
        base = _torch_baseline_fps(chunk_len=8, n_chunks=16)
    except Exception:
        base = None

    extra["ltm_fast_math_frames_per_sec"] = round(
        _ltm_fps(chunk_len=8, n_chain=2048, fast_math=True), 2)
    # aggregate serving throughput: 8 independent videos per scan step
    extra["ltm_b8_frames_per_sec"] = round(
        _ltm_fps(chunk_len=8, n_chain=1024, batch=8), 2)

    fps_nq = _ltm_fps(chunk_len=256, n_chain=256)
    extra["ltm_nextqa_frames_per_sec"] = round(fps_nq, 2)
    try:
        base_nq = _torch_baseline_fps(chunk_len=256, n_chunks=4)
        extra["ltm_nextqa_vs_torch_cpu"] = round(fps_nq / base_nq, 2)
    except Exception:
        pass

    if ON_TPU:
        try:
            # batch>1 measured and rejected: 4 concurrent videos give 181
            # aggregate f/s vs 190 single-stream — an 8-frame EVA-g chunk
            # already saturates the MXU, so video-batching buys nothing here
            # (it helps the LTM-only path: ltm_b8 below).
            extra["e2e_vision_frames_per_sec"] = round(_e2e_vision_fps(), 2)
            extra["e2e_vision_two_phase_frames_per_sec"] = round(
                _e2e_two_phase_fps(), 2)
        except Exception as e:  # never lose the primary metric to an extra
            extra["e2e_vision_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            # second flagship: ∞-VideoChat2 (UMT-L 16-frame S=3136 joint
            # space-time attention + 12-layer LTM Q-former)
            extra["e2e_videochat2_frames_per_sec"] = round(
                _e2e_videochat2_fps(), 2)
        except Exception as e:
            extra["e2e_videochat2_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            extra["flash_attention_ms_s2048"] = round(_attention_ms(True), 4)
            extra["xla_attention_ms_s2048"] = round(
                _attention_ms(False, n_chain=256), 4)
        except Exception as e:
            extra["flash_attention_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            # fused qkv = the serving layout (cli/run_eval._maybe_quantize):
            # b1-neutral, +9% at b8 (587 vs 540 tok/s, round-3 A/B)
            extra["decode_tok_s_int8_7b_b1"] = round(
                _decode_tok_s(batch=1, fused=True), 2)
            extra["decode_tok_s_int8_7b_b8"] = round(
                _decode_tok_s(batch=8, fused=True), 2)
        except Exception as e:
            extra["decode_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            # int4 grouped (g=128) halves the weight stream again vs int8
            extra["decode_tok_s_int4_7b_b1"] = round(
                _decode_tok_s(batch=1, fused=True, bits=4), 2)
        except Exception as e:
            extra["decode_int4_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            # long-session serving: 8k-token KV cache, int8 weights. b1
            # measures the KV-read speed delta; b8 bf16-KV needs 8.6 GB of
            # cache + 7.2 GB weights (capacity) — if it OOMs, that IS the
            # int8-KV story, recorded as such.
            for key_, kwargs in [
                ("decode_tok_s_8k_b1_kv_bf16", dict(batch=1, kv_quant=False)),
                ("decode_tok_s_8k_b1_kv_int8", dict(batch=1, kv_quant=True)),
                ("decode_tok_s_8k_b8_kv_int8", dict(batch=8, kv_quant=True)),
                ("decode_tok_s_8k_b8_kv_bf16", dict(batch=8, kv_quant=False)),
                # int4 weights (3.6 GB) + int8 KV: the deepest capacity
                # point — 8 GB persistent leaves headroom for 16k+ sessions
                ("decode_tok_s_8k_b8_int4_kv_int8",
                 dict(batch=8, kv_quant=True, bits=4)),
                # ...and the session length that headroom buys. Batch is 4,
                # not 8: decode executables with batch*ctx > 2^16 fail in
                # the relay's AOT compile helper with no diagnostic —
                # independent of cache layout, bytes, or HBM capacity
                # (bisection table in docs/KERNELS.md §3d). 8k*b8 and
                # 16k*b4 sit exactly at the measured boundary.
                ("decode_tok_s_16k_b4_int4_kv_int8",
                 dict(batch=4, ctx=16384, kv_quant=True, bits=4)),
            ]:
                # each geometry individually guarded: at batch 8 the bf16
                # cache is 8.6 GB + 7.2 GB weights — if it OOMs, that IS the
                # int8-KV capacity story, recorded as such per entry. Only a
                # genuine RESOURCE_EXHAUSTED earns the bare OOM label; the
                # axon relay's compile helper dies with NO diagnostic on
                # predicted-over-capacity programs ("tpu_compile_helper
                # subprocess exit code 1"), so a compile failure at a
                # geometry whose PERSISTENT bytes (int8 weights + cache +
                # scales) provably exceed HBM is labeled OOM/capacity with
                # the arithmetic attached; any other exception is a code
                # bug and keeps its message (a shape error must not
                # masquerade as a capacity result).
                try:
                    extra[key_] = round(
                        _long_ctx_decode_tok_s(**kwargs), 2)
                except Exception as e:
                    msg = f"{type(e).__name__}: {e}"
                    ctx_, bsz = kwargs.get("ctx", 8192), kwargs["batch"]
                    # k AND v: [32, B, ctx, 8, 128] each, bf16
                    kv_bytes = 2 * 32 * bsz * ctx_ * 8 * 128 * 2
                    kv_bytes = (kv_bytes // 2 + 2 * 32 * bsz * ctx_ * 8 * 4
                                if kwargs["kv_quant"] else kv_bytes)
                    w_bytes = (3_600_000_000
                               if kwargs.get("bits", 8) == 4
                               else 7_170_000_000)
                    persistent = w_bytes + kv_bytes
                    hbm = 15_750_000_000
                    if ("RESOURCE_EXHAUSTED" in str(e)
                            or "out of memory" in str(e).lower()):
                        extra[key_] = f"OOM/{type(e).__name__}"[:60]
                    elif ("remote_compile" in str(e)
                            and persistent > hbm):
                        extra[key_] = (
                            f"OOM/capacity ({persistent/1e9:.1f} GB "
                            f"persistent > {hbm/1e9:.2f} GB HBM; relay "
                            "compile helper reports no diagnostic)")
                    else:
                        extra[key_] = msg[:200]
        except Exception as e:
            extra["kv_quant_bench_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            # hour-scale constant-HBM streaming (north-star #2): 456 x 8-frame
            # chunks (1 h @ 1 fps) through the full e2e encoder in 12 scans,
            # LTM state carried across; flat bytes_in_use after segment 0.
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"))
            from stream_1h import measure as _stream_1h

            r = _stream_1h(n_chunks=456, segments=12)
            extra["e2e_vision_1h_frames_per_sec"] = round(
                r["frames_per_sec"], 2)
            # tri-state: "flat" / "not_flat" / "unavailable" — telemetry
            # absence must never read as a flatness failure (round-4 bug)
            extra["e2e_hbm_verdict"] = r["hbm_verdict"]
            extra["e2e_hbm_source"] = r["hbm_source"]
            extra["e2e_hbm_drift_bytes"] = r["hbm_drift_bytes"]
            extra["e2e_hbm_bytes_per_segment"] = r["hbm_bytes_per_segment"]
        except Exception as e:
            extra["stream_1h_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            pl, sp, acc = _spec_decode_tok_s()
            # CEILING measurement: random-weight greedy output self-repeats,
            # so lookup acceptance here is ~perfect (k+1 per step). The
            # transferable fact is the step-cost equivalence — a (k+1)-wide
            # verify step streams the same weights as a 1-wide step — so
            # real-workload tok/s ≈ plain × (accepted+1 per step), with
            # acceptance set by the text, not the hardware (KERNELS.md §3c).
            extra["decode_tok_s_spec_7b_ceiling"] = round(sp, 2)
            extra["decode_tok_s_spec_7b_plain_generate"] = round(pl, 2)
            extra["spec_accept_tokens_per_step"] = round(acc, 2)
            # REALIZED spec decode (tools/spec_realistic.py): workload
            # acceptance measured on naturalistic text (oracle PLD over a
            # locally-trained byte-BPE of local English prose; extractive-QA
            # answers quote their context, prose continues the document) ×
            # the measured verify-step cost. tok/s(tokens_per_step) =
            # tokens_per_step / T_verify exactly (every verify step runs the
            # same executable); the echo ceiling above is the consistency
            # check (9.0 / T_verify ≈ ceiling tok/s).
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"))
            from spec_realistic import hw_step_costs, measure_text_acceptance

            text = measure_text_acceptance(24)
            t_plain, t_verify = hw_step_costs()
            extra["spec_verify_step_ms"] = round(t_verify * 1e3, 3)
            extra["spec_plain_step_ms"] = round(t_plain * 1e3, 3)
            for w in ("qa", "prose"):
                tps = text[w]["tokens_per_step"]
                extra[f"spec_tokens_per_step_{w}"] = tps
                extra[f"spec_accept_hist_{w}"] = text[w]["accept_hist"]
                extra[f"decode_tok_s_spec_7b_{w}_realized"] = round(
                    tps / t_verify, 1)
            # BATCHED speculative serving point (round-4 VERDICT item 7):
            # the ragged-commit core (runtime/generation.py
            # _generate_speculative_batched_core) at batch 8. T_verify_b8 is
            # one batch-wide verify step; acceptance is per-row and a text
            # property (same oracle workloads as above), so aggregate
            # realized tok/s = 8 * tokens_per_step / T_verify_b8. Own guard
            # + one retry: the tunneled relay occasionally drops a response
            # mid-read ("response body closed"), and that transient must
            # not erase the whole spec block (it did in one r05 run).
            try:
                try:
                    t_plain8, t_verify8 = hw_step_costs(batch=8)
                except Exception:
                    t_plain8, t_verify8 = hw_step_costs(batch=8)
                extra["spec_verify_step_ms_b8"] = round(t_verify8 * 1e3, 3)
                extra["spec_plain_step_ms_b8"] = round(t_plain8 * 1e3, 3)
                extra["decode_tok_s_spec_7b_b8_ceiling"] = round(
                    8 * 9.0 / t_verify8, 1)
                for w in ("qa", "prose"):
                    tps = text[w]["tokens_per_step"]
                    extra[f"decode_tok_s_spec_7b_b8_{w}_realized"] = round(
                        8 * tps / t_verify8, 1)
            except Exception as e:
                extra["spec_b8_error"] = f"{type(e).__name__}: {e}"[:200]
        except Exception as e:
            extra["spec_decode_error"] = f"{type(e).__name__}: {e}"[:200]

    vs = (fps / base) if base else None
    print(json.dumps({
        "metric": "ltm_consolidate_attend_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
