"""Int8 weight-only decoder: closeness to fp, memory halving, generation."""

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.models.decoder import Decoder, tiny_decoder_config
from infinite_video_tpu.models.quantized import (QuantDecoder,
                                                 quantize_decoder_params)
from infinite_video_tpu.runtime.generation import GenerationConfig, generate


def _setup():
    cfg = tiny_decoder_config(hidden_size=64, num_heads=4, num_kv_heads=2,
                              intermediate_size=128, vocab_size=96)
    model = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 96, (1, 10)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    qparams = quantize_decoder_params(params)
    return cfg, model, params, qparams, ids


def test_quantized_logits_close_to_fp():
    cfg, model, params, qparams, ids = _setup()
    ref, _ = model.apply({"params": params}, input_ids=ids)
    qlogits, _ = QuantDecoder(cfg).apply({"params": qparams}, input_ids=ids)
    ref, qlogits = np.asarray(ref), np.asarray(qlogits)
    # int8 weight-only: argmax agreement on nearly all positions, small error
    agree = (ref.argmax(-1) == qlogits.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"
    rel = np.abs(ref - qlogits).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.1, f"mean relative error {rel}"


def test_quantized_param_tree_layout():
    _, _, params, qparams, _ = _setup()
    l0 = qparams["layer_0"]["q_proj"]
    assert l0["kernel_q"].dtype == np.int8
    assert l0["scale"].ndim == 1
    # norms/embedding stay high precision
    assert "kernel_q" not in qparams["layer_0"]["input_ln"]
    assert "embedding" in qparams["embed_tokens"]
    # int8 kernels are half (quarter vs f32) the bytes of the originals
    orig = params["layer_0"]["q_proj"]["kernel"]
    assert l0["kernel_q"].nbytes == orig.nbytes // orig.dtype.itemsize


def test_quantized_generation_runs():
    cfg, model, params, qparams, ids = _setup()
    qmodel = QuantDecoder(cfg)
    out = generate(qmodel, qparams,
                   GenerationConfig(max_new_tokens=6, eos_token_id=-1),
                   prompt_ids=ids)
    assert out.shape == (1, 6)
    assert np.isfinite(np.asarray(out)).all()
