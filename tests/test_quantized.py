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


def test_quant_matmul_kernel_matches_xla_dequant():
    """Pallas weight-streaming matmul (ops/pallas/quant_matmul.py) vs the
    XLA fused dequant-dot, odd shapes exercise the padding."""
    from infinite_video_tpu.ops.pallas.quant_matmul import quant_matmul

    rng = np.random.default_rng(0)
    for (m, k, n) in [(1, 512, 384), (8, 300, 520), (16, 128, 128)]:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        s = jnp.asarray(rng.uniform(0.001, 0.02, (n,)), jnp.float32)
        ref = np.asarray(x.astype(jnp.float32)
                         @ (wq.astype(jnp.float32) * s))
        got = np.asarray(quant_matmul(x, wq, s, interpret=True,
                                      out_dtype=jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_quant_pallas_decode_path_matches_xla():
    """Full decode step through QuantDense with the Pallas path forced on
    (interpret mode) vs the XLA dequant path: same cache-extending logits."""
    import dataclasses

    from infinite_video_tpu.models.decoder import init_kv_cache

    cfg, model, params, qparams, ids = _setup()
    qcfg_xla = dataclasses.replace(cfg, quantized=True, quant_pallas=False)
    qcfg_pl = dataclasses.replace(cfg, quantized=True, quant_pallas=True,
                                  flash_interpret=True)

    def decode_logits(qcfg):
        m = Decoder(qcfg)
        mask = jnp.zeros((1, 12)).at[:, :10].set(1.0)
        cache = init_kv_cache(qcfg, 1, 12)
        _, cache = m.apply({"params": qparams}, input_ids=ids,
                           attention_mask=mask, cache=cache)
        mask = mask.at[:, 10].set(1.0)
        logits, _ = m.apply({"params": qparams},
                            input_ids=jnp.asarray([[5]], jnp.int32),
                            attention_mask=mask, cache=cache)
        return np.asarray(logits[:, -1])

    np.testing.assert_allclose(decode_logits(qcfg_pl),
                               decode_logits(qcfg_xla), rtol=5e-2, atol=5e-2)


def test_fused_proj_decode_matches_unfused():
    """fused_proj serving layout (qkv_proj/gateup_proj — 4 weight streams per
    layer instead of 7): identical logits to the unfused tree, int8 and fp."""
    import dataclasses

    from infinite_video_tpu.models.decoder import init_kv_cache
    from infinite_video_tpu.models.quantized import fuse_decoder_params

    cfg, model, params, qparams, ids = _setup()

    def decode_logits(use_cfg, p):
        m = Decoder(use_cfg)
        mask = jnp.zeros((1, 12)).at[:, :10].set(1.0)
        cache = init_kv_cache(use_cfg, 1, 12)
        _, cache = m.apply({"params": p}, input_ids=ids,
                           attention_mask=mask, cache=cache)
        mask = mask.at[:, 10].set(1.0)
        logits, _ = m.apply({"params": p},
                            input_ids=jnp.asarray([[7]], jnp.int32),
                            attention_mask=mask, cache=cache)
        return np.asarray(logits[:, -1])

    # int8
    qcfg = dataclasses.replace(cfg, quantized=True)
    qcfg_f = dataclasses.replace(qcfg, fused_proj=True, fused_mlp=True)
    np.testing.assert_allclose(
        decode_logits(qcfg_f, fuse_decoder_params(qparams)),
        decode_logits(qcfg, qparams), rtol=1e-5, atol=1e-5)
    # fp
    cfg_f = dataclasses.replace(cfg, fused_proj=True, fused_mlp=True)
    np.testing.assert_allclose(
        decode_logits(cfg_f, fuse_decoder_params(params)),
        decode_logits(cfg, params), rtol=1e-5, atol=1e-5)
