"""Autoregressive generation: prefill + jitted decode loop with stop sequences.

Replaces the reference's HF `generate` calls
(conversation_video.py:156-167 — sampling with stop words "###" ids [835] and
[2277, 29937]; eval_code/run_nextqa_mistral.py:278-299 — greedy). The decode
loop is a `lax.while_loop` over a static-shape KV cache, so one compilation
serves every question of an eval run.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.models.decoder import Decoder, DecoderConfig, KVCache, init_kv_cache

__all__ = ["GenerationConfig", "generate", "host_embed_table",
           "interleave_prompt_embeds"]


def host_embed_table(dec_params) -> "np.ndarray":
    """Pull the token-embedding table to host once (cache it!).

    Prompt assembly interleaves tokenizer segments of arbitrary length with
    video embeddings; doing the gather/concat as device ops costs one remote
    compile per distinct segment-length combination (seconds each on a
    tunneled TPU). The embedding is a pure gather, so the host does it for
    free — see interleave_prompt_embeds."""
    return np.asarray(dec_params["embed_tokens"]["embedding"])


def interleave_prompt_embeds(table, tokenizer, segments, video_embs,
                             add_special_first: bool = True):
    """[seg0] v0 [seg1] v1 … [segN] -> [1, S, D] float32 numpy (host-side).

    `table`: host embedding table (host_embed_table); `video_embs`: list of
    [1, Q, D] arrays (device or host). Mirrors the reference's
    get_context_emb splice (conversation_video.py:265-279)."""
    assert len(segments) == len(video_embs) + 1, \
        "Unmatched numbers of placeholders and video embeddings."
    parts = []
    for i, seg in enumerate(segments):
        ids = tokenizer(seg,
                        add_special_tokens=(add_special_first and i == 0))[
                            "input_ids"]
        parts.append(np.asarray(table[np.asarray(ids, np.int32)],
                                np.float32)[None])
        if i < len(video_embs):
            parts.append(np.asarray(video_embs[i], np.float32))
    return np.concatenate(parts, axis=1)


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 300
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 0.9
    eos_token_id: int = 2
    pad_token_id: int = 0
    min_new_tokens: int = 1                 # HF min_length analogue
    repetition_penalty: float = 1.0         # HF convention (1.0 = off)
    # Stop sequences as token-id tuples; reference uses "###" ids
    # (conversation_video.py:142-144).
    stop_sequences: Tuple[Tuple[int, ...], ...] = ()
    # Length bucketing: LEFT-pad the prompt to the next multiple so serving
    # reuses the prefill/decode executables across prompt lengths instead of
    # recompiling per question (remote compiles cost seconds-to-minutes on
    # tunneled TPUs). 0 = exact length (flash prefill stays available).
    pad_to_multiple: int = 0
    # Speculative decoding (prompt-lookup drafting):
    # spec_tokens > 0 verifies that many n-gram-drafted tokens per decode
    # step in ONE widened forward. b1 decode streams the full weight set per
    # step regardless of 1 or K+1 in-flight tokens (HBM-bound — see
    # docs/KERNELS.md §3), so accepted drafts are nearly free. Greedy decode
    # yields the exact greedy continuation regardless of draft quality;
    # sampling uses exact point-mass speculative sampling (same output
    # DISTRIBUTION as plain sampling; rng consumption differs). Batch > 1
    # uses the ragged-commit batched core (_generate_speculative_batched_core
    # — greedy only; per-row accept lengths, per-row drafts). Ignored (plain
    # decode) when repetition_penalty != 1, or when batch > 1 with sampling.
    spec_tokens: int = 0
    spec_ngram: int = 3


def _top_p_filter(logits: jnp.ndarray, temperature: float, top_p: float):
    """Temperature + nucleus filtering with HF warper semantics
    (TemperatureLogitsWarper then TopPLogitsWarper): keep the smallest prefix
    of descending-probability tokens whose cumulative mass reaches top_p —
    tokens whose *preceding* cumulative mass < top_p are kept. Returns the
    filtered (temperature-scaled) logits with dropped entries at -inf."""
    logits = logits / jnp.maximum(temperature, 1e-6)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    cutoff_mask = (cum - sorted_probs) < top_p
    threshold = jnp.min(jnp.where(cutoff_mask, sorted_logits, jnp.inf), axis=-1,
                        keepdims=True)
    return jnp.where(logits >= threshold, logits, -jnp.inf)


def _sample_top_p(key, logits: jnp.ndarray, temperature: float, top_p: float):
    return jax.random.categorical(
        key, _top_p_filter(logits, temperature, top_p), axis=-1)


def _apply_repetition_penalty(logits, tokens, num_generated, penalty: float,
                              vocab: int):
    """HF semantics over the tokens generated so far: seen logits divided by
    the penalty when positive, multiplied when negative. Only positions
    < num_generated count — the pad-initialised tail of the buffer must not
    mark pad/EOS as 'seen'. (The prompt is embeddings here, so unlike HF the
    penalty covers generated tokens only.)"""
    valid = (jnp.arange(tokens.shape[1]) < num_generated).astype(jnp.float32)
    seen = jnp.zeros((tokens.shape[0], vocab))
    seen = seen.at[jnp.arange(tokens.shape[0])[:, None], tokens].max(valid[None, :])
    penalised = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen > 0, penalised, logits)


def _next_token(key, logits, cfg: GenerationConfig, tokens=None,
                gen_index=0):
    """Pick the token at (0-based) generated position `gen_index`."""
    if cfg.repetition_penalty != 1.0 and tokens is not None:
        logits = _apply_repetition_penalty(logits, tokens, gen_index,
                                           cfg.repetition_penalty,
                                           logits.shape[-1])
    if cfg.min_new_tokens >= 1:
        # HF MinNewTokensLengthLogitsProcessor: EOS is banned while the number
        # of tokens generated *so far* (= gen_index at pick time) is below
        # min_new_tokens, so min_new_tokens=1 blocks EOS as the first token.
        block = gen_index < cfg.min_new_tokens
        logits = jnp.where(
            block & (jnp.arange(logits.shape[-1]) == cfg.eos_token_id)[None, :],
            -jnp.inf, logits)
    if cfg.do_sample:
        return _sample_top_p(key, logits, cfg.temperature, cfg.top_p)
    return jnp.argmax(logits, axis=-1)


def _hits_stop(tokens: jnp.ndarray, t: jnp.ndarray, stop: Tuple[int, ...]) -> jnp.ndarray:
    """True where the stop id sequence ends at position t of `tokens` [B, T]."""
    hit = jnp.ones(tokens.shape[0], bool)
    for j, sid in enumerate(reversed(stop)):
        idx = t - j
        ok = (idx >= 0) & (tokens[:, jnp.maximum(idx, 0)] == sid)
        hit &= ok
    return hit


def generate(
    model: Decoder,
    params,
    cfg: GenerationConfig,
    *,
    prompt_embeds: Optional[jnp.ndarray] = None,   # [B, S, D]
    prompt_ids: Optional[jnp.ndarray] = None,      # [B, S]
    prompt_mask: Optional[jnp.ndarray] = None,     # [B, S] 0/1
    rng: Optional[jax.Array] = None,
    draft_ids=None,                 # 1-D ids for prompt-lookup drafting
    return_spec_stats: bool = False,
) -> jnp.ndarray:
    """Returns generated token ids [B, max_new_tokens] (pad after stop/EOS).

    cfg.spec_tokens > 0 (B=1) switches to speculative decoding:
    `draft_ids` (typically the prompt's text token ids) seed the
    prompt-lookup table; with `return_spec_stats` the return is
    (tokens, {"verify_steps", "committed"}).

    The whole prefill + decode loop runs as ONE jitted executable per
    (prompt-shape, cfg) — never eagerly. Eager `model.apply` dispatches every
    XLA op separately (~1000 remote round-trips per 32-layer prefill on a
    tunneled TPU, tens of seconds); the jitted core makes a warm question a
    single dispatch. Combine with cfg.pad_to_multiple so all questions of an
    eval share a handful of executables.
    """
    if prompt_embeds is None:
        prompt_embeds = model.apply({"params": params}, input_ids=prompt_ids,
                                    embed_only=True)
    b, s, _ = prompt_embeds.shape
    masked = prompt_mask is not None
    if cfg.pad_to_multiple and s % cfg.pad_to_multiple:
        # bucket the prompt length: left-pad embeddings + mask; pad_offset
        # below keeps RoPE phases content-aligned, identical outputs (tested)
        extra = cfg.pad_to_multiple - s % cfg.pad_to_multiple
        prompt_embeds = jnp.pad(prompt_embeds, ((0, 0), (extra, 0), (0, 0)))
        if prompt_mask is None:
            prompt_mask = jnp.ones((b, s))
        prompt_mask = jnp.pad(prompt_mask, ((0, 0), (extra, 0)))
        masked = True
        s += extra
    if prompt_mask is None:
        prompt_mask = jnp.ones((b, s))
    if rng is None:
        rng = jax.random.PRNGKey(0)
    use_spec = (cfg.spec_tokens > 0 and b == 1
                and cfg.repetition_penalty == 1.0)
    use_spec_batched = (cfg.spec_tokens > 0 and b > 1
                        and not cfg.do_sample
                        and cfg.repetition_penalty == 1.0)
    if use_spec:
        ctx0, start = _spec_context(cfg, draft_ids)
        tokens, nsteps, committed = _generate_speculative_core(
            model, cfg, masked, params, jnp.asarray(prompt_embeds),
            prompt_mask, jnp.asarray(ctx0), jnp.asarray(start, jnp.int32),
            rng)
        if return_spec_stats:
            return tokens, {"verify_steps": int(nsteps),
                            "committed": int(committed) + 1}
        return tokens
    if use_spec_batched:
        ctx0, start = _spec_context_batched(cfg, draft_ids, b)
        tokens, nsteps, committed = _generate_speculative_batched_core(
            model, cfg, masked, params, jnp.asarray(prompt_embeds),
            prompt_mask, jnp.asarray(ctx0), jnp.asarray(start, jnp.int32),
            rng)
        if return_spec_stats:
            return tokens, {"verify_steps": int(nsteps),
                            "committed": int(committed)}
        return tokens
    out = _generate_core(model, cfg, masked, params,
                         jnp.asarray(prompt_embeds), prompt_mask, rng)
    if return_spec_stats:
        return out, {"verify_steps": None, "committed": None}
    return out


def _decode_body(model: Decoder, cfg: GenerationConfig, params, s: int,
                 pad_offset):
    """One decode step over state (t, tokens, cache, done, mask, rng) —
    shared by the fused loop (_generate_core) and the segmented streaming
    loop (_decode_segment_core)."""

    def body(state):
        t, tokens, cache, done, mask, rng = state
        mask = mask.at[:, s + t].set(1.0)
        logits, cache = model.apply({"params": params},
                                    input_ids=tokens[:, t][:, None],
                                    attention_mask=mask, cache=cache,
                                    position_offset=pad_offset)
        rng, sub = jax.random.split(rng)
        nxt = _next_token(sub, logits[:, -1], cfg, tokens=tokens,
                          gen_index=t + 1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        tokens = tokens.at[:, t + 1].set(nxt)
        newly_done = nxt == cfg.eos_token_id
        for stop in cfg.stop_sequences:
            newly_done |= _hits_stop(tokens, t + 1, stop)
        return t + 1, tokens, cache, done | newly_done, mask, rng

    return body


def _prefill_state(model: Decoder, cfg: GenerationConfig, masked: bool,
                   params, prompt_embeds, prompt_mask, rng):
    """Prefill + first token -> (decode state, pad_offset)."""
    dcfg: DecoderConfig = model.cfg
    b, s, _ = prompt_embeds.shape
    max_len = s + cfg.max_new_tokens

    cache = init_kv_cache(dcfg, b, max_len)
    buffer_mask = jnp.zeros((b, max_len))
    # Unpadded prompts + use_flash: prefill without a mask so the decoder's
    # flash-prefill path applies (causal over in-flight tokens on the fresh
    # cache; the unwritten buffer tail is already excluded by causality).
    flash_prefill = not masked and dcfg.use_flash and s > 1
    buffer_mask = jax.lax.dynamic_update_slice(buffer_mask,
                                               prompt_mask.astype(jnp.float32), (0, 0))
    # LEFT-padded batching: per-row RoPE offsets so every row's content ends
    # at the same cache slot (prompts of different lengths batch together).
    pad_offset = (1.0 - prompt_mask.astype(jnp.float32)).sum(axis=1).astype(jnp.int32)

    logits, cache = model.apply(
        {"params": params}, inputs_embeds=prompt_embeds,
        attention_mask=None if flash_prefill else buffer_mask, cache=cache,
        position_offset=None if flash_prefill else pad_offset)
    rng, sub = jax.random.split(rng)
    first = _next_token(sub, logits[:, -1], cfg, gen_index=0)

    tokens = jnp.full((b, cfg.max_new_tokens), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(first.astype(jnp.int32))

    done0 = (first == cfg.eos_token_id)
    for stop in cfg.stop_sequences:
        done0 |= _hits_stop(tokens, jnp.asarray(0), stop)
    return (jnp.asarray(0), tokens, cache, done0, buffer_mask, rng), pad_offset


@partial(jax.jit, static_argnames=("model", "cfg", "masked"))
def _generate_core(model: Decoder, cfg: GenerationConfig, masked: bool,
                   params, prompt_embeds, prompt_mask, rng) -> jnp.ndarray:
    s = prompt_embeds.shape[1]
    state, pad_offset = _prefill_state(model, cfg, masked, params,
                                       prompt_embeds, prompt_mask, rng)
    body = _decode_body(model, cfg, params, s, pad_offset)

    def cond(state):
        t, _, _, done, _, _ = state
        return (t < cfg.max_new_tokens - 1) & ~jnp.all(done)

    _, tokens, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens


# ---------------------------------------------------------------------------
# Speculative decoding: prompt-lookup drafting + one-forward verification.
# No reference counterpart (the reference decodes strictly token-by-token via
# HF generate, conversation_video.py:156-167); this is the TPU-serving lever
# for the b1 latency path, where each step is weight-streaming-bound.


def _ngram_draft(ctx, cur, last_tok, k: int, ngram: int):
    """Draft `k` tokens by continuing the most recent earlier occurrence of
    the trailing `ngram` committed tokens in `ctx[:cur]` (prompt-lookup).

    ctx: [L] i32 — prompt/draft-context ids then committed generations;
    entries < 0 are sentinels (left padding / video-embedding spans) and can
    never match a committed gram. Falls back to repeating `last_tok` when no
    match exists (drafts only affect speed, never output)."""
    L = ctx.shape[0]
    pos_arr = jnp.arange(L)
    g = jax.lax.dynamic_slice(ctx, (jnp.clip(cur - ngram, 0, L - ngram),),
                              (ngram,))
    match = jnp.ones((L,), bool)
    for j in range(ngram):
        match &= jnp.roll(ctx, -j) == g[j]
    # windows fully before the trailing gram itself (also kills cur < ngram)
    match &= pos_arr < cur - ngram
    p = jnp.max(jnp.where(match, pos_arr, -1))
    found = p >= 0
    start = jnp.clip(jnp.where(found, p + ngram, 0), 0, L - k)
    cand = jax.lax.dynamic_slice(ctx, (start,), (k,))
    draft = jnp.where(found, cand, jnp.full((k,), last_tok, jnp.int32))
    # sentinel entries would gather out-of-bounds in the embedding; clamp to
    # a real id (acceptance still requires equality with the model's pick)
    return jnp.maximum(draft, 0)


def _pick_greedy_window(logits, cfg: GenerationConfig, t):
    """Greedy picks for a [B, W, V] verify window; position i has HF
    gen_index t+1+i (mirrors _next_token's min_new_tokens EOS blocking)."""
    if cfg.min_new_tokens >= 1:
        gi = t + 1 + jnp.arange(logits.shape[1])
        block = (gi < cfg.min_new_tokens)[None, :, None]
        eos = (jnp.arange(logits.shape[-1]) == cfg.eos_token_id)[None, None, :]
        logits = jnp.where(block & eos, -jnp.inf, logits)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("model", "cfg", "masked"))
def _generate_speculative_core(model: Decoder, cfg: GenerationConfig,
                               masked: bool, params, prompt_embeds,
                               prompt_mask, ctx0, ctx_start, rng):
    """B=1 decode, `cfg.spec_tokens` drafted tokens verified per forward.
    Each iteration runs the decoder ONCE on [last_committed, d1..dK] (width
    K+1, KV written at cache.pos..pos+K), commits the accepted draft prefix
    plus one model token, and REWINDS cache.pos to the committed length —
    rejected slots are overwritten by the next window.

    Greedy: accept while draft i+1 equals the model's argmax at position i;
    the first divergent position commits the argmax token.
    Sampled: exact speculative sampling with a point-mass draft — accept
    d_{i+1} with probability p_i(d_{i+1}) under the warped (temperature/
    top-p/min-new) distribution; the first rejection commits a sample from
    the residual p_i restricted to x != d_{i+1} (= p conditioned on not-d,
    the max(p-q,0) residual for a point mass q), a full acceptance commits
    a bonus sample from p_K. Marginally and jointly the output sequence is
    distributed exactly as plain sampling (tested via TV distance); rng
    consumption differs, so same-seed traces differ from the plain path.

    Returns (tokens [B, max_new], verify_steps, committed)."""
    k = cfg.spec_tokens
    s = prompt_embeds.shape[1]
    # prefill with the verify-window overshoot built into every buffer: the
    # last window starts at t = max_new-2 and writes KV/mask/tokens up to
    # k past the plain-decode extent — a dynamic_update_slice against the
    # exact-size cache would CLAMP the start index and silently overwrite
    # committed slots (the bug class test_speculative_matches_plain_greedy
    # guards: it corrupts only near-budget windows)
    pcfg = dataclasses.replace(cfg, max_new_tokens=cfg.max_new_tokens + k + 1)
    state, pad_offset = _prefill_state(model, pcfg, masked, params,
                                       prompt_embeds, prompt_mask, rng)
    t0, tokens, cache0, done0, buffer_mask, rng0 = state
    ctx = jax.lax.dynamic_update_slice(ctx0, tokens[0, :1], (ctx_start,))
    max_len = buffer_mask.shape[1]
    col = jnp.arange(max_len)[None, :]
    idx = jnp.arange(k + 1)

    def cond(st):
        t, _, _, done, _, _, _, _ = st
        return (t < cfg.max_new_tokens - 1) & ~jnp.all(done)

    def body(st):
        t, tokens, cache, done, ctx, cur, rng, nsteps = st
        last = tokens[0, t]
        draft = _ngram_draft(ctx, cur, last, k, cfg.spec_ngram)
        step_ids = jnp.concatenate([last[None], draft])[None, :]
        pos = cache.pos
        # valid keys: the prompt's own mask (left padding stays excluded)
        # plus every generated/in-flight buffer slot; causality among the
        # in-flight window is the decoder's buffer-slot causal bias
        mask = jnp.maximum(buffer_mask,
                           ((col >= s) & (col < pos + k + 1)).astype(
                               buffer_mask.dtype))
        logits, cache = model.apply({"params": params}, input_ids=step_ids,
                                    attention_mask=mask, cache=cache,
                                    position_offset=pad_offset)
        if cfg.do_sample:
            rng, ku, kr, kb = jax.random.split(rng, 4)
            # warped per-position logits (same pipeline as _next_token:
            # min-new EOS block, then temperature + nucleus filtering)
            lw = logits[0]                                      # [K+1, V]
            if cfg.min_new_tokens >= 1:
                gi = t + 1 + idx
                block = (gi < cfg.min_new_tokens)[:, None]
                eos = (jnp.arange(lw.shape[-1]) == cfg.eos_token_id)[None, :]
                lw = jnp.where(block & eos, -jnp.inf, lw)
            fl = _top_p_filter(lw, cfg.temperature, cfg.top_p)  # [K+1, V]
            p = jax.nn.softmax(fl, axis=-1)
            pd = p[jnp.arange(k), draft]                        # p_i(d_{i+1})
            accept = jax.random.uniform(ku, (k,)) < pd
            accepted = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))
            # residual samples for every position (used only at the first
            # rejection): p_i with the draft token excluded; plus the bonus
            # sample from p_K for full acceptance
            res_logits = fl.at[jnp.arange(k), draft].set(-jnp.inf)
            cand = jnp.concatenate([
                jax.random.categorical(kr, res_logits[:k], axis=-1),
                jax.random.categorical(kb, fl[k:k + 1], axis=-1),
            ]).astype(jnp.int32)                                # [K+1]
            out = jnp.where(idx < accepted,
                            jnp.concatenate([draft, draft[:1]]), cand)
        else:
            out = _pick_greedy_window(logits, cfg, t)[0]        # [K+1]
            accepted = jnp.sum(jnp.cumprod(
                (draft == out[:k]).astype(jnp.int32)))
        c_try = accepted + 1
        # stop/EOS scan over the tentatively committed window (the window
        # must be in the buffer first — stop sequences span backwards)
        win_try = jnp.where(idx < c_try, out, cfg.pad_token_id)
        tokens_try = jax.lax.dynamic_update_slice(tokens, win_try[None],
                                                  (0, t + 1))
        hit = (out == cfg.eos_token_id) & (idx < c_try)
        for stop in cfg.stop_sequences:
            for i in range(k + 1):
                hit = hit.at[i].set(
                    hit[i] | _hits_stop(tokens_try, t + 1 + i, stop)[0])
        hit &= idx < c_try
        first_hit = jnp.min(jnp.where(hit, idx, k + 1))
        c = jnp.where(first_hit <= k, first_hit + 1, c_try)
        c = jnp.minimum(c, cfg.max_new_tokens - 1 - t)           # budget cap
        win = jnp.where(idx < c, out, cfg.pad_token_id)
        tokens = jax.lax.dynamic_update_slice(tokens, win[None], (0, t + 1))
        ctx = jax.lax.dynamic_update_slice(ctx, win, (cur,))
        done = done | jnp.any(hit & (idx < c))[None]
        cache = cache.replace(pos=pos + c)                        # rewind
        return t + c, tokens, cache, done, ctx, cur + c, rng, nsteps + 1

    st = (jnp.asarray(t0, jnp.int32), tokens, cache0, done0, ctx,
          jnp.asarray(ctx_start + 1, jnp.int32), rng0,
          jnp.asarray(0, jnp.int32))
    t, tokens, _, _, _, _, _, nsteps = jax.lax.while_loop(cond, body, st)
    return tokens[:, :cfg.max_new_tokens], nsteps, t


def _window_write(buf: jnp.ndarray, win: jnp.ndarray,
                  start: jnp.ndarray) -> jnp.ndarray:
    """Write `win` [B, W] into `buf` [B, T] at per-row offsets `start` [B]
    (the batched analogue of dynamic_update_slice with a per-row start).
    Gather-based — no scatter, so it lowers to vector selects on TPU."""
    col = jnp.arange(buf.shape[1])[None, :]
    rel = col - start[:, None]
    take = (rel >= 0) & (rel < win.shape[1])
    gathered = jnp.take_along_axis(win, jnp.clip(rel, 0, win.shape[1] - 1),
                                   axis=1)
    return jnp.where(take, gathered, buf)


def _hits_stop_at(tokens: jnp.ndarray, end: jnp.ndarray,
                  stop: Tuple[int, ...]) -> jnp.ndarray:
    """True per row where the stop id sequence ends at per-row index `end`
    of `tokens` [B, T] (the per-row-index analogue of _hits_stop)."""
    hit = jnp.ones(tokens.shape[0], bool)
    for j, sid in enumerate(reversed(stop)):
        i2 = end - j
        tok = jnp.take_along_axis(
            tokens, jnp.clip(i2, 0, tokens.shape[1] - 1)[:, None], axis=1)[:, 0]
        hit &= (i2 >= 0) & (tok == sid)
    return hit


@partial(jax.jit, static_argnames=("model", "cfg", "masked"))
def _generate_speculative_batched_core(model: Decoder, cfg: GenerationConfig,
                                       masked: bool, params, prompt_embeds,
                                       prompt_mask, ctx0, ctx_start, rng):
    """Batched greedy speculative decode with RAGGED per-row commits.

    The b1 core rewinds cache.pos to the committed length each step — with a
    batch that is impossible (KVCache.pos is one scalar; rows accept
    different draft prefixes). This core decouples BUFFER SLOTS from LOGICAL
    POSITIONS instead:

      - every verify step writes its K+1-wide window at the same shared
        slots [pos, pos+K+1) for all rows and pos always advances by K+1 —
        no rewind, no per-row scatter;
      - each row tracks its logical generated count g_r; a per-row kv_mask
        marks which buffer slots hold that row's committed tokens
        (slot pos+i valid iff i < c_r this step) — rejected-draft slots stay
        masked out forever and are simply dead slots;
      - RoPE phases come from per-row `position_ids`
        (s - pad_r + g_r - 1 + i), so the content stream stays contiguous
        even though buffer slots are not.

    The price is cache capacity: the generated region occupies
    steps·(K+1) ≤ max_new·(K+1) slots instead of max_new (the prompt region
    is unaffected), and attention reads scan the wider buffer — both
    negligible against the 7B weight stream that dominates a decode step
    (docs/KERNELS.md §3). Greedy only: per-row outputs equal plain batched
    greedy decode exactly (tests/test_generation.py); sampling at b>1 falls
    back to the plain path in generate().

    Returns (tokens [B, max_new], verify_steps, total committed tokens)."""
    k = cfg.spec_tokens
    b, s, _ = prompt_embeds.shape
    dcfg: DecoderConfig = model.cfg
    max_new = cfg.max_new_tokens
    max_len = s + (max_new + 1) * (k + 1)
    idx = jnp.arange(k + 1)

    # --- prefill (custom buffer sizes; mirrors _prefill_state otherwise) ---
    cache = init_kv_cache(dcfg, b, max_len)
    buffer_mask = jnp.zeros((b, max_len))
    flash_prefill = not masked and dcfg.use_flash and s > 1
    buffer_mask = jax.lax.dynamic_update_slice(
        buffer_mask, prompt_mask.astype(jnp.float32), (0, 0))
    pad_offset = (1.0 - prompt_mask.astype(jnp.float32)).sum(axis=1).astype(
        jnp.int32)
    logits, cache = model.apply(
        {"params": params}, inputs_embeds=prompt_embeds,
        attention_mask=None if flash_prefill else buffer_mask, cache=cache,
        position_offset=None if flash_prefill else pad_offset)
    rng, sub = jax.random.split(rng)
    first = _next_token(sub, logits[:, -1], cfg, gen_index=0).astype(jnp.int32)

    tokens = jnp.full((b, max_new + k + 1), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(first)
    done = first == cfg.eos_token_id
    for stop in cfg.stop_sequences:
        done |= _hits_stop(tokens, jnp.asarray(0), stop)
    g = jnp.ones((b,), jnp.int32)                    # committed per row
    ctx = _window_write(ctx0, first[:, None], ctx_start)
    cur = ctx_start + 1
    col = jnp.arange(max_len)[None, :]
    draft_fn = jax.vmap(
        lambda c, u, l: _ngram_draft(c, u, l, k, cfg.spec_ngram))

    def cond(st):
        g, _, _, done, _, _, _, _ = st
        return ~jnp.all(done | (g >= max_new))

    def body(st):
        g, tokens, cache, done, ctx, cur, kv_mask, nsteps = st
        last = jnp.take_along_axis(tokens, (g - 1)[:, None], axis=1)[:, 0]
        draft = draft_fn(ctx, cur, last)                       # [B, K]
        step_ids = jnp.concatenate([last[:, None], draft], axis=1)
        pos = cache.pos
        mask = jnp.maximum(kv_mask, ((col >= pos) & (col < pos + k + 1))
                           .astype(kv_mask.dtype))
        position_ids = (s - pad_offset + g - 1)[:, None] + idx[None, :]
        logits, cache = model.apply({"params": params}, input_ids=step_ids,
                                    attention_mask=mask, cache=cache,
                                    position_ids=position_ids)
        lw = logits                                            # [B, K+1, V]
        if cfg.min_new_tokens >= 1:
            gi = g[:, None] + idx[None, :]
            block = (gi < cfg.min_new_tokens)[:, :, None]
            eos1 = (jnp.arange(lw.shape[-1]) == cfg.eos_token_id)[None, None]
            lw = jnp.where(block & eos1, -jnp.inf, lw)
        out = jnp.argmax(lw, axis=-1).astype(jnp.int32)        # [B, K+1]
        accepted = jnp.sum(jnp.cumprod(
            (draft == out[:, :k]).astype(jnp.int32), axis=1), axis=1)
        c_try = accepted + 1
        win_try = jnp.where(idx[None] < c_try[:, None], out, cfg.pad_token_id)
        tokens_try = _window_write(tokens, win_try, g)
        hit = (out == cfg.eos_token_id) & (idx[None] < c_try[:, None])
        for stop in cfg.stop_sequences:
            for i in range(k + 1):
                hit = hit.at[:, i].set(
                    hit[:, i] | _hits_stop_at(tokens_try, g + i, stop))
        hit &= idx[None] < c_try[:, None]
        first_hit = jnp.min(jnp.where(hit, idx[None], k + 1), axis=1)
        c = jnp.where(first_hit <= k, first_hit + 1, c_try)
        c = jnp.minimum(c, max_new - g)                        # budget cap
        c = jnp.where(done, 0, c)
        win = jnp.where(idx[None] < c[:, None], out, cfg.pad_token_id)
        tokens = _window_write(tokens, win, g)
        ctx = _window_write(ctx, win, cur)
        kv_mask = jnp.where((col >= pos) & (col < pos + c[:, None]),
                            1.0, kv_mask)
        done = done | jnp.any(hit & (idx[None] < c[:, None]), axis=1)
        cache = cache.replace(pos=pos + k + 1)
        return g + c, tokens, cache, done, ctx, cur + c, kv_mask, nsteps + 1

    st = (g, tokens, cache, done, ctx, cur, buffer_mask,
          jnp.asarray(0, jnp.int32))
    g, tokens, _, _, _, _, _, nsteps = jax.lax.while_loop(cond, body, st)
    return tokens[:, :max_new], nsteps, g.sum()


def _spec_context_batched(cfg: GenerationConfig, draft_ids,
                          b: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row draft-context buffers for the batched core: [B, L] with -1
    left pad / sentinel spans and right-aligned generation room (length
    bucketed to 128 like _spec_context). `draft_ids` may be None, one 1-D id
    array shared by every row, a list of per-row 1-D arrays, or [B, L] ids.
    Returns (ctx [B, L], write_start [B])."""
    gen_room = cfg.max_new_tokens + cfg.spec_tokens + 1
    if draft_ids is None:
        rows = [np.zeros((0,), np.int32)] * b
    elif isinstance(draft_ids, (list, tuple)):
        rows = [np.asarray(r, np.int32).reshape(-1) for r in draft_ids]
    else:
        a = np.asarray(draft_ids, np.int32)
        rows = [a.reshape(-1)] * b if a.ndim == 1 else list(a)
    assert len(rows) == b, (len(rows), b)
    total = max(r.shape[0] for r in rows) + gen_room
    padded = -(-total // 128) * 128
    ctx = np.full((b, padded), -1, np.int32)
    start = np.full((b,), padded - gen_room, np.int32)
    for i, r in enumerate(rows):
        if len(r):
            ctx[i, start[i] - len(r):start[i]] = r
    return ctx, start


def _spec_context(cfg: GenerationConfig, draft_ids) -> Tuple[np.ndarray, int]:
    """Host-side draft-context buffer: [-1 left pad | draft ids | room for
    max_new + K + 1 generated tokens], length bucketed to 128 so distinct
    draft-context lengths share executables. Returns (ctx, write_start)."""
    ids = (np.asarray(draft_ids, np.int32).reshape(-1)
           if draft_ids is not None else np.zeros((0,), np.int32))
    gen_room = cfg.max_new_tokens + cfg.spec_tokens + 1
    total = ids.shape[0] + gen_room
    padded = -(-total // 128) * 128
    ctx = np.full((padded,), -1, np.int32)
    start = padded - gen_room
    ctx[start - ids.shape[0]:start] = ids
    return ctx, start


@partial(jax.jit, static_argnames=("model", "cfg", "masked"))
def _prefill_core(model: Decoder, cfg: GenerationConfig, masked: bool,
                  params, prompt_embeds, prompt_mask, rng):
    return _prefill_state(model, cfg, masked, params, prompt_embeds,
                          prompt_mask, rng)


@partial(jax.jit, static_argnames=("model", "cfg", "s", "segment"))
def _decode_segment_core(model: Decoder, cfg: GenerationConfig, s: int,
                         segment: int, params, state, pad_offset):
    """Advance the decode loop by up to `segment` steps (streaming mode)."""
    t0 = state[0]
    body = _decode_body(model, cfg, params, s, pad_offset)

    def cond(state):
        t, _, _, done, _, _ = state
        return ((t < cfg.max_new_tokens - 1) & (t < t0 + segment)
                & ~jnp.all(done))

    return jax.lax.while_loop(cond, body, state)


def generate_stream(
    model: Decoder,
    params,
    cfg: GenerationConfig,
    *,
    prompt_embeds: Optional[jnp.ndarray] = None,
    prompt_ids: Optional[jnp.ndarray] = None,
    prompt_mask: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    segment: int = 8,
):
    """Incremental decoding: yields numpy int32 [B, n_new] of newly decided
    token ids, `segment` steps per device round-trip.

    Identical results to generate() (same jitted step body, same rng
    threading) delivered as two executables — a prefill and a reusable
    `segment`-step decode loop — instead of one fused loop. Segments bound
    the dispatch overhead on tunneled TPUs (~segment tokens per round-trip)
    while first-token latency is just the prefill. The caller may run other
    device work between pulls (the serving layer interleaves queued chats'
    segments this way).
    """
    if prompt_embeds is None:
        prompt_embeds = model.apply({"params": params}, input_ids=prompt_ids,
                                    embed_only=True)
    b, s, _ = prompt_embeds.shape
    masked = prompt_mask is not None
    if cfg.pad_to_multiple and s % cfg.pad_to_multiple:
        extra = cfg.pad_to_multiple - s % cfg.pad_to_multiple
        prompt_embeds = jnp.pad(prompt_embeds, ((0, 0), (extra, 0), (0, 0)))
        if prompt_mask is None:
            prompt_mask = jnp.ones((b, s))
        prompt_mask = jnp.pad(prompt_mask, ((0, 0), (extra, 0)))
        masked = True
        s += extra
    if prompt_mask is None:
        prompt_mask = jnp.ones((b, s))
    if rng is None:
        rng = jax.random.PRNGKey(0)

    import numpy as np

    state, pad_offset = _prefill_core(model, cfg, masked, params,
                                      jnp.asarray(prompt_embeds), prompt_mask,
                                      rng)
    emitted = 0
    while True:
        t = int(state[0])
        avail = t + 1
        if avail > emitted:
            yield np.asarray(state[1][:, emitted:avail])
            emitted = avail
        if bool(np.all(np.asarray(state[3]))) or t >= cfg.max_new_tokens - 1:
            return
        state = _decode_segment_core(model, cfg, s, max(1, segment), params,
                                     state, pad_offset)
