"""Greedy generation parity vs HF transformers + stop-sequence behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.convert.decoder import convert_decoder_state_dict
from infinite_video_tpu.models.decoder import Decoder, DecoderConfig
from infinite_video_tpu.runtime.generation import GenerationConfig, generate


def _tiny_pair(seed=0):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        rms_norm_eps=1e-6, attn_implementation="eager", tie_word_embeddings=False,
    ))
    hf.eval()
    cfg = DecoderConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                        num_layers=2, num_heads=4, num_kv_heads=4,
                        rms_eps=1e-6, dtype=jnp.float32)
    params = convert_decoder_state_dict(hf.state_dict())
    return hf, Decoder(cfg), params


def test_greedy_matches_hf():
    import torch

    hf, model, params = _tiny_pair()
    ids = np.random.default_rng(0).integers(3, 96, (1, 8))
    with torch.no_grad():
        ref = hf.generate(torch.tensor(ids), max_new_tokens=12, do_sample=False,
                          eos_token_id=None, pad_token_id=0)
    ref_new = ref[0, 8:].numpy()

    out = generate(model, params,
                   GenerationConfig(max_new_tokens=12, do_sample=False,
                                    eos_token_id=-1),
                   prompt_ids=jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(out[0]), ref_new)


def test_stop_sequence_halts_generation():
    _, model, params = _tiny_pair(seed=1)
    ids = np.random.default_rng(1).integers(3, 96, (1, 6))
    # First find what greedy produces unrestricted.
    free = np.asarray(generate(
        model, params, GenerationConfig(max_new_tokens=10, eos_token_id=-1),
        prompt_ids=jnp.asarray(ids))[0])
    stop_tok = int(free[3])
    out = np.asarray(generate(
        model, params,
        GenerationConfig(max_new_tokens=10, eos_token_id=-1, pad_token_id=0,
                         stop_sequences=((stop_tok,),)),
        prompt_ids=jnp.asarray(ids))[0])
    # Identical up to and including the first stop-token hit, padding after.
    j = int(np.argmax(free == stop_tok))
    assert list(out[:j + 1]) == list(free[:j + 1])
    assert (out[j + 1:] == 0).all()


def test_generate_from_embeds_with_padding_mask():
    _, model, params = _tiny_pair(seed=2)
    ids = np.random.default_rng(2).integers(3, 96, (1, 5))
    emb = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      embed_only=True)
    out1 = np.asarray(generate(model, params,
                               GenerationConfig(max_new_tokens=6, eos_token_id=-1),
                               prompt_embeds=emb))
    out2 = np.asarray(generate(model, params,
                               GenerationConfig(max_new_tokens=6, eos_token_id=-1),
                               prompt_ids=jnp.asarray(ids)))
    np.testing.assert_array_equal(out1, out2)


def test_repetition_penalty_discourages_repeats():
    _, model, params = _tiny_pair(seed=3)
    ids = np.random.default_rng(3).integers(3, 96, (1, 6))
    plain = np.asarray(generate(
        model, params, GenerationConfig(max_new_tokens=16, eos_token_id=-1),
        prompt_ids=jnp.asarray(ids))[0])
    pen = np.asarray(generate(
        model, params, GenerationConfig(max_new_tokens=16, eos_token_id=-1,
                                        repetition_penalty=5.0),
        prompt_ids=jnp.asarray(ids))[0])
    # with a strong penalty the output has at least as many distinct tokens
    assert len(set(pen.tolist())) >= len(set(plain.tolist()))


def test_min_new_tokens_blocks_early_eos():
    _, model, params = _tiny_pair(seed=4)
    ids = np.random.default_rng(4).integers(3, 96, (1, 5))
    free = np.asarray(generate(
        model, params, GenerationConfig(max_new_tokens=12, eos_token_id=-1),
        prompt_ids=jnp.asarray(ids))[0])
    eos_tok = int(free[1])  # pretend the 2nd greedy token is "EOS"
    out = np.asarray(generate(
        model, params,
        GenerationConfig(max_new_tokens=12, eos_token_id=eos_tok,
                         pad_token_id=0, min_new_tokens=6),
        prompt_ids=jnp.asarray(ids))[0])
    # the first 5 generated steps may not emit eos_tok via the decode loop
    assert eos_tok not in out[1:5].tolist()


def test_left_padded_batch_matches_single():
    """Two prompts of different lengths, left-padded into one batch, must
    produce the same greedy continuations as individual runs."""
    _, model, params = _tiny_pair(seed=6)
    rng = np.random.default_rng(6)
    p1 = rng.integers(3, 96, (1, 4))
    p2 = rng.integers(3, 96, (1, 7))
    cfg_g = GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0)
    out1 = np.asarray(generate(model, params, cfg_g, prompt_ids=jnp.asarray(p1))[0])
    out2 = np.asarray(generate(model, params, cfg_g, prompt_ids=jnp.asarray(p2))[0])

    # left-pad p1 to length 7 with token 0 and mask zeros
    ids = np.concatenate([np.zeros((1, 3), np.int64), p1], axis=1)
    batch_ids = np.concatenate([ids, p2], axis=0)
    mask = np.asarray([[0, 0, 0, 1, 1, 1, 1], [1] * 7], np.float32)
    emb = model.apply({"params": params}, input_ids=jnp.asarray(batch_ids),
                      embed_only=True)
    out = np.asarray(generate(model, params, cfg_g, prompt_embeds=emb,
                              prompt_mask=jnp.asarray(mask)))
    np.testing.assert_array_equal(out[0], out1)
    np.testing.assert_array_equal(out[1], out2)


def test_min_new_tokens_blocks_eos_on_first_token():
    _, model, params = _tiny_pair(seed=7)
    ids = np.random.default_rng(7).integers(3, 96, (1, 5))
    free = np.asarray(generate(
        model, params, GenerationConfig(max_new_tokens=8, eos_token_id=-1),
        prompt_ids=jnp.asarray(ids))[0])
    eos_tok = int(free[0])  # the very first greedy token
    out = np.asarray(generate(
        model, params,
        GenerationConfig(max_new_tokens=8, eos_token_id=eos_tok,
                         pad_token_id=0, min_new_tokens=4),
        prompt_ids=jnp.asarray(ids))[0])
    assert out[0] != eos_tok  # EOS banned at generated index 0

    # HF semantics: min_new_tokens=1 also blocks EOS as the *first* token
    out1 = np.asarray(generate(
        model, params,
        GenerationConfig(max_new_tokens=8, eos_token_id=eos_tok,
                         pad_token_id=0, min_new_tokens=1),
        prompt_ids=jnp.asarray(ids))[0])
    assert out1[0] != eos_tok


def test_repetition_penalty_ignores_pad_buffer():
    """pad_token_id == eos_token_id must not be penalized from step 0 (the
    unwritten buffer tail is pad-initialised)."""
    _, model, params = _tiny_pair(seed=8)
    ids = np.random.default_rng(8).integers(3, 96, (1, 5))
    base = np.asarray(generate(
        model, params,
        GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=7),
        prompt_ids=jnp.asarray(ids))[0])
    # token 7 never generated => a strong penalty must not alter anything
    # until an actual repeat occurs; first two tokens must match exactly
    pen = np.asarray(generate(
        model, params,
        GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=7,
                         repetition_penalty=10.0),
        prompt_ids=jnp.asarray(ids))[0])
    assert pen[0] == base[0]
    if base[1] != base[0]:
        assert pen[1] == base[1]


def test_flash_prefill_generation_matches_einsum_path():
    """use_flash decoders take the flash-prefill path on unpadded prompts
    (interpret mode on CPU); greedy outputs must match the masked-einsum
    path token-for-token."""
    import dataclasses

    _, model, params = _tiny_pair(seed=9)
    flash_cfg = dataclasses.replace(model.cfg, use_flash=True,
                                    flash_interpret=True)
    from infinite_video_tpu.models.decoder import Decoder

    flash_model = Decoder(flash_cfg)
    ids = np.random.default_rng(9).integers(3, 96, (2, 7))
    cfg_g = GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0)
    base = np.asarray(generate(model, params, cfg_g, prompt_ids=jnp.asarray(ids)))
    flash = np.asarray(generate(flash_model, params, cfg_g,
                                prompt_ids=jnp.asarray(ids)))
    np.testing.assert_array_equal(flash, base)

    # left-padded prompts keep the masked path (flash prefill needs no mask)
    emb = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      embed_only=True)
    mask = np.ones((2, 7), np.float32)
    mask[0, :2] = 0.0
    out = np.asarray(generate(flash_model, params, cfg_g, prompt_embeds=emb,
                              prompt_mask=jnp.asarray(mask)))
    ref = np.asarray(generate(model, params, cfg_g, prompt_embeds=emb,
                              prompt_mask=jnp.asarray(mask)))
    np.testing.assert_array_equal(out, ref)


def test_pad_to_multiple_bucketing_matches_exact():
    """Length-bucketed generation (pad_to_multiple) must produce the same
    greedy tokens as exact-length generation: left-padding + mask + RoPE
    offsets keep the content positions identical."""
    _, model, params = _tiny_pair(3)
    ids = np.random.default_rng(5).integers(3, 96, (1, 11))  # 11 -> bucket 16
    base = generate(model, params,
                    GenerationConfig(max_new_tokens=10, do_sample=False,
                                     eos_token_id=None or -1),
                    prompt_ids=jnp.asarray(ids, jnp.int32))
    bucketed = generate(model, params,
                        GenerationConfig(max_new_tokens=10, do_sample=False,
                                         eos_token_id=-1, pad_to_multiple=16),
                        prompt_ids=jnp.asarray(ids, jnp.int32))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(bucketed))
    # already-aligned prompts are untouched (same executable geometry)
    ids16 = np.random.default_rng(6).integers(3, 96, (1, 16))
    a = generate(model, params,
                 GenerationConfig(max_new_tokens=6, do_sample=False,
                                  eos_token_id=-1, pad_to_multiple=16),
                 prompt_ids=jnp.asarray(ids16, jnp.int32))
    b = generate(model, params,
                 GenerationConfig(max_new_tokens=6, do_sample=False,
                                  eos_token_id=-1),
                 prompt_ids=jnp.asarray(ids16, jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pad_to_multiple_with_explicit_mask():
    """Bucketing composes with caller-supplied left-padded batches."""
    _, model, params = _tiny_pair(4)
    ids = np.random.default_rng(7).integers(3, 96, (1, 9))
    emb_model = lambda i: model.apply({"params": params},
                                      input_ids=jnp.asarray(i, jnp.int32),
                                      embed_only=True)
    base = generate(model, params,
                    GenerationConfig(max_new_tokens=8, do_sample=False,
                                     eos_token_id=-1),
                    prompt_embeds=emb_model(ids))
    # caller left-pads by 2 with a mask; bucketing pads further to 16
    emb = jnp.pad(emb_model(ids), ((0, 0), (2, 0), (0, 0)))
    mask = jnp.pad(jnp.ones((1, 9)), ((0, 0), (2, 0)))
    bucketed = generate(model, params,
                        GenerationConfig(max_new_tokens=8, do_sample=False,
                                         eos_token_id=-1, pad_to_multiple=16),
                        prompt_embeds=emb, prompt_mask=mask)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(bucketed))


def test_top_p_filter_matches_hf_warpers():
    """Filtered support + probabilities equal HF's Temperature+TopP warpers
    exactly (conversation_video.py:156-167 samples with do_sample=True)."""
    import torch
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper, TopPLogitsWarper)

    from infinite_video_tpu.runtime.generation import _top_p_filter

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(3, 96)).astype(np.float32) * 3.0
    for temp, top_p in [(1.0, 0.9), (0.7, 0.9), (0.2, 0.5), (1.5, 0.99)]:
        warped = TopPLogitsWarper(top_p=top_p)(
            None, TemperatureLogitsWarper(temp)(None, torch.tensor(logits)))
        ours = np.asarray(_top_p_filter(jnp.asarray(logits), temp, top_p))
        ref = warped.numpy()
        np.testing.assert_array_equal(np.isfinite(ours), np.isfinite(ref))
        ref_p = torch.softmax(warped, dim=-1).numpy()
        our_p = np.asarray(jax.nn.softmax(jnp.asarray(ours), axis=-1))
        np.testing.assert_allclose(our_p, ref_p, rtol=1e-5, atol=1e-6)


def test_sampled_decoding_statistical_parity():
    """TV distance between our empirical top-p sampling distribution and the
    HF analytic distribution on real tiny-decoder logits (SURVEY §7 hard-part
    4: the LLaMA eval path samples, conversation_video.py:156-167)."""
    import torch
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper, TopPLogitsWarper)

    from infinite_video_tpu.runtime.generation import _sample_top_p

    hf, model, params = _tiny_pair(seed=3)
    ids = np.random.default_rng(1).integers(3, 96, (1, 8))
    with torch.no_grad():
        t_logits = hf(torch.tensor(ids)).logits[:, -1, :]
    logits = np.asarray(t_logits, np.float32)

    temp, top_p = 0.8, 0.9
    warped = TopPLogitsWarper(top_p=top_p)(
        None, TemperatureLogitsWarper(temp)(None, torch.tensor(logits)))
    hf_probs = torch.softmax(warped, dim=-1).numpy()[0]

    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    draws = jax.vmap(
        lambda k: _sample_top_p(k, jnp.asarray(logits), temp, top_p)[0])(keys)
    counts = np.bincount(np.asarray(draws), minlength=96)
    emp = counts / n
    tv = 0.5 * np.abs(emp - hf_probs).sum()
    # TV of an n-sample empirical vs its own law concentrates near
    # sqrt(2k/(pi n)) for k live tokens; 0.03 gives ~5 sigma headroom here
    assert tv < 0.03, f"TV distance {tv:.4f}"
    # nothing sampled outside HF's nucleus
    assert counts[~np.isfinite(warped.numpy()[0])].sum() == 0


def test_sampling_seed_reproducibility():
    """Same rng -> identical tokens (jit-stable); different rng -> different
    draws somewhere in the sequence."""
    _, model, params = _tiny_pair(seed=4)
    ids = jnp.asarray(np.random.default_rng(2).integers(3, 96, (1, 6)))
    cfg = GenerationConfig(max_new_tokens=16, do_sample=True, temperature=1.2,
                           top_p=0.95, eos_token_id=-1)
    a = generate(model, params, cfg, prompt_ids=ids, rng=jax.random.PRNGKey(11))
    b = generate(model, params, cfg, prompt_ids=ids, rng=jax.random.PRNGKey(11))
    c = generate(model, params, cfg, prompt_ids=ids, rng=jax.random.PRNGKey(12))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) != np.asarray(c)).any()


def _tiny_stream_setup():
    _, model, params = _tiny_pair()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 96, (2, 7)),
                      jnp.int32)
    return model, params, ids


def test_generate_stream_matches_generate_greedy():
    """Segmented streaming (prefill + N-step decode executables) must decide
    the exact same tokens as the fused generate() loop."""
    import numpy as np

    from infinite_video_tpu.runtime.generation import generate_stream

    model, params, ids = _tiny_stream_setup()
    gcfg = GenerationConfig(max_new_tokens=13, do_sample=False,
                            eos_token_id=-1)
    fused = np.asarray(generate(model, params, gcfg, prompt_ids=ids))
    pieces = list(generate_stream(model, params, gcfg, prompt_ids=ids,
                                  segment=4))
    assert all(p.shape[0] == fused.shape[0] for p in pieces)
    np.testing.assert_array_equal(np.concatenate(pieces, axis=1), fused)
    # first piece is the prefill token alone: lowest first-token latency
    assert pieces[0].shape[1] == 1


def test_generate_stream_matches_generate_sampled():
    """Same rng threading => identical sampled tokens, segmented or fused."""
    import numpy as np

    from infinite_video_tpu.runtime.generation import generate_stream

    model, params, ids = _tiny_stream_setup()
    gcfg = GenerationConfig(max_new_tokens=9, do_sample=True, temperature=0.9,
                            top_p=0.8, eos_token_id=-1)
    rng = jax.random.PRNGKey(7)
    fused = np.asarray(generate(model, params, gcfg, prompt_ids=ids, rng=rng))
    pieces = list(generate_stream(model, params, gcfg, prompt_ids=ids,
                                  rng=rng, segment=3))
    np.testing.assert_array_equal(np.concatenate(pieces, axis=1), fused)


def test_generate_stream_stops_early_on_eos():
    """A stop on EOS ends the stream without running out max_new_tokens."""
    import numpy as np

    from infinite_video_tpu.runtime.generation import generate_stream

    model, params, ids = _tiny_stream_setup()
    ids = ids[:1]  # single row: the whole batch stops when it stops
    # pick the greedy first token as "EOS" so the stream stops immediately
    g0 = np.asarray(generate(model, params,
                             GenerationConfig(max_new_tokens=2,
                                              eos_token_id=-1),
                             prompt_ids=ids))[0, 0]
    gcfg = GenerationConfig(max_new_tokens=50, do_sample=False,
                            eos_token_id=int(g0), min_new_tokens=0)
    pieces = list(generate_stream(model, params, gcfg, prompt_ids=ids,
                                  segment=8))
    total = np.concatenate(pieces, axis=1)
    assert total.shape[1] <= 9  # prefill token + at most one segment


# ---------------------------------------------------------------------------
# Speculative decoding (prompt-lookup drafting + one-forward verification)


def _spec_cfg(**kw):
    base = dict(max_new_tokens=24, do_sample=False, eos_token_id=-1,
                pad_token_id=0, spec_tokens=6, spec_ngram=3)
    base.update(kw)
    return GenerationConfig(**base)


def test_speculative_matches_plain_greedy():
    """Output tokens are EXACTLY the plain greedy decode, whatever the draft
    quality: no draft context, prompt-ids draft context, and a deliberately
    misleading context must all reproduce generate()'s tokens."""
    _, model, params = _tiny_pair(seed=3)
    rng = np.random.default_rng(3)
    for trial in range(4):
        ids = rng.integers(3, 96, (1, 5 + trial))
        plain = np.asarray(generate(
            model, params, _spec_cfg(spec_tokens=0),
            prompt_ids=jnp.asarray(ids)))
        for draft in (None, ids[0], rng.integers(3, 96, (40,))):
            spec = np.asarray(generate(
                model, params, _spec_cfg(), prompt_ids=jnp.asarray(ids),
                draft_ids=draft))
            np.testing.assert_array_equal(spec, plain)


def test_speculative_accepts_on_echo_context():
    """When the draft context contains the model's own greedy continuation
    (the prompt-lookup sweet spot: re-generated phrases), verification
    commits multiple tokens per forward — verify_steps must come in well
    under one per token. Also checks stats bookkeeping."""
    _, model, params = _tiny_pair(seed=4)
    ids = np.random.default_rng(4).integers(3, 96, (1, 6))
    plain = np.asarray(generate(model, params, _spec_cfg(spec_tokens=0),
                                prompt_ids=jnp.asarray(ids)))
    echo_ctx = np.concatenate([ids[0], plain[0]])
    spec, stats = generate(model, params, _spec_cfg(),
                           prompt_ids=jnp.asarray(ids), draft_ids=echo_ctx,
                           return_spec_stats=True)
    np.testing.assert_array_equal(np.asarray(spec), plain)
    assert stats["committed"] == 24
    # 24 tokens in <= 7 verify steps (ceil(24/ (6+1)) = 4 ideal; the first
    # couple of steps have no gram match yet)
    assert stats["verify_steps"] <= 7, stats


def test_speculative_stop_sequence_and_eos():
    """Stop sequences and EOS inside a committed window truncate exactly as
    the plain loop does (pad after the stop position)."""
    _, model, params = _tiny_pair(seed=1)
    ids = np.random.default_rng(1).integers(3, 96, (1, 6))
    free = np.asarray(generate(
        model, params, _spec_cfg(max_new_tokens=10, spec_tokens=0),
        prompt_ids=jnp.asarray(ids))[0])
    stop_tok = int(free[3])
    for cfg_kw in ({"stop_sequences": ((stop_tok,),)},
                   {"stop_sequences": ((int(free[2]), int(free[3])),)},
                   {"eos_token_id": stop_tok}):
        plain = np.asarray(generate(
            model, params, _spec_cfg(max_new_tokens=10, spec_tokens=0,
                                     **cfg_kw),
            prompt_ids=jnp.asarray(ids)))
        spec = np.asarray(generate(
            model, params, _spec_cfg(max_new_tokens=10, **cfg_kw),
            prompt_ids=jnp.asarray(ids), draft_ids=free))
        np.testing.assert_array_equal(spec, plain)


def test_speculative_min_new_tokens_and_tiny_budgets():
    """min_new_tokens EOS blocking applies per window position; budgets
    smaller than the window commit exactly max_new_tokens."""
    _, model, params = _tiny_pair(seed=2)
    ids = np.random.default_rng(2).integers(3, 96, (1, 4))
    free = np.asarray(generate(
        model, params, _spec_cfg(max_new_tokens=8, spec_tokens=0),
        prompt_ids=jnp.asarray(ids))[0])
    eos = int(free[0])
    for kw in ({"max_new_tokens": 2}, {"max_new_tokens": 3, "spec_tokens": 8},
               {"eos_token_id": eos, "min_new_tokens": 3}):
        plain = np.asarray(generate(
            model, params, _spec_cfg(spec_tokens=0, **{k: v for k, v in
                                                       kw.items()
                                                       if k != "spec_tokens"}),
            prompt_ids=jnp.asarray(ids)))
        spec = np.asarray(generate(model, params, _spec_cfg(**kw),
                                   prompt_ids=jnp.asarray(ids),
                                   draft_ids=free))
        np.testing.assert_array_equal(spec, plain)


def test_speculative_with_pad_to_multiple_and_embeds():
    """Left-pad bucketing (serving mode) + prompt embeddings compose with
    the speculative path."""
    _, model, params = _tiny_pair(seed=5)
    ids = np.random.default_rng(5).integers(3, 96, (1, 7))
    embs = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                       embed_only=True)
    plain = np.asarray(generate(
        model, params, _spec_cfg(spec_tokens=0, pad_to_multiple=16),
        prompt_embeds=embs))
    spec = np.asarray(generate(
        model, params, _spec_cfg(pad_to_multiple=16), prompt_embeds=embs,
        draft_ids=ids[0]))
    np.testing.assert_array_equal(spec, plain)


def test_speculative_falls_back_when_unsupported():
    """Repetition penalty silently uses the plain path; greedy batch>1 now
    routes through the batched ragged-commit core, whose outputs must equal
    plain batched greedy exactly."""
    _, model, params = _tiny_pair(seed=0)
    ids = np.random.default_rng(0).integers(3, 96, (2, 6))
    rp_spec = np.asarray(generate(
        model, params, _spec_cfg(repetition_penalty=1.3),
        prompt_ids=jnp.asarray(ids[:1])))
    rp_plain = np.asarray(generate(
        model, params, _spec_cfg(repetition_penalty=1.3, spec_tokens=0),
        prompt_ids=jnp.asarray(ids[:1])))
    np.testing.assert_array_equal(rp_spec, rp_plain)
    batched = np.asarray(generate(model, params, _spec_cfg(),
                                  prompt_ids=jnp.asarray(ids)))
    batched_plain = np.asarray(generate(model, params, _spec_cfg(spec_tokens=0),
                                        prompt_ids=jnp.asarray(ids)))
    np.testing.assert_array_equal(batched, batched_plain)
    # sampling at b>1 stays on the plain path (the batched core is
    # greedy-only): same seed => identical trace
    samp_spec = np.asarray(generate(
        model, params, _spec_cfg(do_sample=True, temperature=0.9),
        prompt_ids=jnp.asarray(ids), rng=jax.random.PRNGKey(5)))
    samp_plain = np.asarray(generate(
        model, params, _spec_cfg(do_sample=True, temperature=0.9,
                                 spec_tokens=0),
        prompt_ids=jnp.asarray(ids), rng=jax.random.PRNGKey(5)))
    np.testing.assert_array_equal(samp_spec, samp_plain)


def test_speculative_batched_matches_plain_greedy():
    """Batched ragged-commit speculative decode: whatever the per-row draft
    quality (echo for one row, junk for another, none for a third), outputs
    equal plain batched greedy decode EXACTLY, and per-row accept rates may
    differ (the ragged part)."""
    _, model, params = _tiny_pair(seed=7)
    rng = np.random.default_rng(7)
    ids = rng.integers(3, 96, (3, 6))
    plain = np.asarray(generate(model, params, _spec_cfg(spec_tokens=0),
                                prompt_ids=jnp.asarray(ids)))
    echo0 = np.concatenate([ids[0], plain[0]])
    junk = rng.integers(3, 96, (30,))
    spec, stats = generate(model, params, _spec_cfg(),
                           prompt_ids=jnp.asarray(ids),
                           draft_ids=[echo0, junk, np.zeros(0, np.int32)],
                           return_spec_stats=True)
    np.testing.assert_array_equal(np.asarray(spec), plain)
    assert stats["committed"] == 3 * 24, stats
    # the echo row cannot make the LOOP shorter than the junk rows need,
    # but the whole batch must still finish in <= max_new verify steps
    assert stats["verify_steps"] <= 24, stats


def test_speculative_batched_all_echo_is_fast():
    """All rows with echo contexts: the batch commits multiple tokens per
    row per verify step, so verify_steps comes in well under max_new."""
    _, model, params = _tiny_pair(seed=8)
    ids = np.random.default_rng(8).integers(3, 96, (2, 5))
    plain = np.asarray(generate(model, params, _spec_cfg(spec_tokens=0),
                                prompt_ids=jnp.asarray(ids)))
    drafts = [np.concatenate([ids[i], plain[i]]) for i in range(2)]
    spec, stats = generate(model, params, _spec_cfg(),
                           prompt_ids=jnp.asarray(ids), draft_ids=drafts,
                           return_spec_stats=True)
    np.testing.assert_array_equal(np.asarray(spec), plain)
    assert stats["verify_steps"] <= 8, stats


def test_speculative_batched_stop_eos_and_budgets():
    """Per-row EOS/stop-sequence truncation and sub-window budgets match the
    plain batched loop exactly (rows stop raggedly)."""
    _, model, params = _tiny_pair(seed=9)
    ids = np.random.default_rng(9).integers(3, 96, (2, 6))
    free = np.asarray(generate(
        model, params, _spec_cfg(max_new_tokens=12, spec_tokens=0),
        prompt_ids=jnp.asarray(ids)))
    stop_tok = int(free[0][4])      # row 0 stops mid-stream, row 1 may not
    for kw in ({"stop_sequences": ((stop_tok,),)},
               {"eos_token_id": stop_tok},
               {"eos_token_id": stop_tok, "min_new_tokens": 3},
               {"max_new_tokens": 3, "spec_tokens": 8}):
        plain = np.asarray(generate(
            model, params,
            _spec_cfg(max_new_tokens=kw.get("max_new_tokens", 12),
                      spec_tokens=0,
                      **{k: v for k, v in kw.items()
                         if k not in ("spec_tokens", "max_new_tokens")}),
            prompt_ids=jnp.asarray(ids)))
        spec = np.asarray(generate(
            model, params,
            _spec_cfg(**{**{"max_new_tokens": 12}, **kw}),
            prompt_ids=jnp.asarray(ids), draft_ids=[free[0], free[1]]))
        np.testing.assert_array_equal(spec, plain)


def test_speculative_batched_left_padded_embeds():
    """Left-padded prompt embeddings + mask (the serving answer_batch shape)
    compose with the batched speculative path: per-row RoPE offsets keep
    positions content-aligned."""
    _, model, params = _tiny_pair(seed=10)
    rng = np.random.default_rng(10)
    rows = [rng.integers(3, 96, (n,)) for n in (5, 8)]
    width = max(len(r) for r in rows)
    ids_p = np.zeros((2, width), np.int64)
    mask = np.zeros((2, width), np.float32)
    for i, r in enumerate(rows):
        ids_p[i, width - len(r):] = r
        mask[i, width - len(r):] = 1.0
    embs = model.apply({"params": params}, input_ids=jnp.asarray(ids_p),
                       embed_only=True)
    plain = np.asarray(generate(
        model, params, _spec_cfg(spec_tokens=0), prompt_embeds=embs,
        prompt_mask=jnp.asarray(mask)))
    spec = np.asarray(generate(
        model, params, _spec_cfg(), prompt_embeds=embs,
        prompt_mask=jnp.asarray(mask), draft_ids=[r for r in rows]))
    np.testing.assert_array_equal(spec, plain)


def test_speculative_sampling_statistical_parity():
    """Point-mass speculative sampling is DISTRIBUTION-exact: per-position
    marginals of spec-sampled sequences match plain sampling within TV
    noise, for both a high-acceptance (greedy-echo) and a garbage draft
    context; rng consumption differs so traces aren't compared."""
    from infinite_video_tpu.runtime.generation import (
        _generate_core, _generate_speculative_core, _spec_context)

    _, model, params = _tiny_pair(seed=3)
    ids = np.random.default_rng(1).integers(3, 96, (1, 6))
    embs = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                       embed_only=True)
    mask = jnp.ones((1, embs.shape[1]))
    n, max_new = 6000, 4
    cfg_s = _spec_cfg(do_sample=True, temperature=0.8, top_p=0.9,
                      max_new_tokens=max_new, spec_tokens=3)
    cfg_p = _spec_cfg(do_sample=True, temperature=0.8, top_p=0.9,
                      max_new_tokens=max_new, spec_tokens=0)
    def plain_run(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), n)
        return np.asarray(jax.vmap(
            lambda r: _generate_core(model, cfg_p, False, params, embs, mask,
                                     r))(keys))[:, 0, :]

    def tv(a_runs, b_runs, pos):
        pc = np.bincount(a_runs[:, pos], minlength=96) / n
        sc = np.bincount(b_runs[:, pos], minlength=96) / n
        return 0.5 * np.abs(pc - sc).sum()

    plain = plain_run(0)
    # empirical-vs-empirical noise floor: two independent plain runs (the
    # flat tiny-model logits keep ~90 tokens live, so the analytic
    # sqrt(2k/pi n) floor is ~0.07 here — calibrate instead of hard-coding)
    control = plain_run(100)
    floors = [tv(plain, control, pos) for pos in range(max_new)]
    echo = np.asarray(generate(model, params,
                               _spec_cfg(max_new_tokens=max_new, spec_tokens=0),
                               prompt_ids=jnp.asarray(ids)))[0]
    for draft in (echo, np.random.default_rng(9).integers(3, 96, (30,))):
        ctx0, start = _spec_context(cfg_s, draft)
        spec = np.asarray(jax.vmap(
            lambda r: _generate_speculative_core(
                model, cfg_s, False, params, embs, mask, jnp.asarray(ctx0),
                jnp.asarray(start, jnp.int32), r)[0]
        )(jax.random.split(jax.random.PRNGKey(1), n)))[:, 0, :]
        for pos in range(max_new):
            d = tv(plain, spec, pos)
            # same-law empiricals: spec TV should sit at the control floor;
            # a distribution bug (e.g. biased acceptance) shows up as 2-10x
            assert d < 1.6 * floors[pos] + 0.01, \
                f"pos {pos}: TV {d:.4f} vs floor {floors[pos]:.4f} " \
                f"(draft len {len(draft)})"


def test_speculative_sampling_seed_reproducibility():
    """Same rng -> identical speculative-sampled tokens; different rng ->
    different draws somewhere."""
    _, model, params = _tiny_pair(seed=4)
    ids = jnp.asarray(np.random.default_rng(2).integers(3, 96, (1, 6)))
    cfg = _spec_cfg(do_sample=True, temperature=1.2, top_p=0.95,
                    max_new_tokens=16)
    a = generate(model, params, cfg, prompt_ids=ids,
                 rng=jax.random.PRNGKey(11), draft_ids=np.asarray(ids[0]))
    b = generate(model, params, cfg, prompt_ids=ids,
                 rng=jax.random.PRNGKey(11), draft_ids=np.asarray(ids[0]))
    c = generate(model, params, cfg, prompt_ids=ids,
                 rng=jax.random.PRNGKey(12), draft_ids=np.asarray(ids[0]))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) != np.asarray(c)).any()
