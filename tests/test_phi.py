"""Phi decoder parity vs HF transformers + cache consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.convert.phi import convert_phi_state_dict
from infinite_video_tpu.models.decoder import init_kv_cache
from infinite_video_tpu.models.phi import PhiDecoder, tiny_phi_config


def _pair():
    import torch
    from transformers import PhiConfig as HFPhiConfig
    from transformers import PhiForCausalLM

    torch.manual_seed(0)
    hf = PhiForCausalLM(HFPhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, layer_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False))
    hf.eval()
    cfg = tiny_phi_config(partial_rotary_factor=0.5)
    return hf, PhiDecoder(cfg), convert_phi_state_dict(hf.state_dict()), cfg


def test_phi_matches_hf():
    import torch

    hf, model, params, _ = _pair()
    ids = np.random.default_rng(0).integers(0, 128, (2, 9))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _ = model.apply({"params": params}, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=3e-4, atol=3e-4)


def test_phi_cache_consistency():
    hf, model, params, cfg = _pair()
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (1, 8)))
    full, _ = model.apply({"params": params}, input_ids=ids)

    class _C:  # reuse decoder cache shape helper with phi dims
        num_layers = cfg.num_layers
        num_kv_heads = cfg.num_kv_heads
        head_dim = cfg.head_dim
        dtype = jnp.float32

    cache = init_kv_cache(_C, batch=1, max_len=12, dtype=jnp.float32)
    pre, cache = model.apply({"params": params}, input_ids=ids[:, :5],
                             cache=cache)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :5]),
                               rtol=1e-4, atol=1e-5)
    for t in range(5, 8):
        step, cache = model.apply({"params": params}, input_ids=ids[:, t:t + 1],
                                  cache=cache)
        np.testing.assert_allclose(np.asarray(step[:, 0]),
                                   np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)
