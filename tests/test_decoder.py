"""Decoder parity vs HF transformers (tiny random configs, torch CPU) +
KV-cache consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinite_video_tpu.convert.decoder import convert_decoder_state_dict
from infinite_video_tpu.models.decoder import (Decoder, DecoderConfig,
                                               init_kv_cache)


def _hf_llama(gqa: bool):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=160,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2 if gqa else 4,
        rms_norm_eps=1e-6, rope_theta=10000.0, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    return model


def _jax_cfg(gqa: bool) -> DecoderConfig:
    return DecoderConfig(vocab_size=128, hidden_size=64, intermediate_size=160,
                         num_layers=2, num_heads=4, num_kv_heads=2 if gqa else 4,
                         rms_eps=1e-6, rope_theta=10000.0, dtype=jnp.float32)


@pytest.mark.parametrize("gqa", [False, True], ids=["mha", "gqa"])
def test_decoder_matches_hf(gqa):
    import torch

    hf = _hf_llama(gqa)
    ids = np.random.default_rng(0).integers(0, 128, (2, 9))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()

    params = convert_decoder_state_dict(hf.state_dict())
    logits, _ = Decoder(_jax_cfg(gqa)).apply({"params": params},
                                             input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_decoder_inputs_embeds_matches_hf():
    import torch

    hf = _hf_llama(False)
    emb = np.random.default_rng(1).normal(size=(1, 7, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.tensor(emb)).logits.numpy()
    params = convert_decoder_state_dict(hf.state_dict())
    logits, _ = Decoder(_jax_cfg(False)).apply({"params": params},
                                               inputs_embeds=jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_kv_cache_prefill_then_decode_matches_full_forward():
    cfg = _jax_cfg(True)
    model = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (1, 10)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]

    full_logits, _ = model.apply({"params": params}, input_ids=ids)

    cache = init_kv_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    pre_logits, cache = model.apply({"params": params}, input_ids=ids[:, :6],
                                    cache=cache)
    np.testing.assert_allclose(np.asarray(pre_logits),
                               np.asarray(full_logits[:, :6]), rtol=1e-4, atol=1e-5)
    for t in range(6, 10):
        step_logits, cache = model.apply({"params": params},
                                         input_ids=ids[:, t:t + 1], cache=cache)
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   rtol=1e-4, atol=1e-5)
    assert int(cache.pos) == 10


def test_sliding_window_masks_old_positions():
    cfg = DecoderConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_layers=1, num_heads=2, num_kv_heads=2,
                        sliding_window=4, dtype=jnp.float32)
    model = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 64, (1, 12)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    logits, _ = model.apply({"params": params}, input_ids=ids)
    # Changing a token more than `window` positions back must not affect logits.
    ids2 = ids.at[0, 0].set((ids[0, 0] + 1) % 64)
    logits2, _ = model.apply({"params": params}, input_ids=ids2)
    np.testing.assert_allclose(np.asarray(logits[:, -1]), np.asarray(logits2[:, -1]),
                               rtol=1e-6, atol=1e-6)


def test_flash_path_matches_einsum_path():
    import dataclasses

    cfg = _jax_cfg(True)
    model = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 128, (2, 33)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    ref, _ = model.apply({"params": params}, input_ids=ids)

    fcfg = dataclasses.replace(cfg, use_flash=True, flash_interpret=True)
    out, _ = Decoder(fcfg).apply({"params": params}, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
