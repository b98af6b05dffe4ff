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


def test_quant_matmul_int4_kernel_matches_xla_dequant():
    """Pallas packed-int4 matmul (interpret mode) vs an exact dequantized
    fp reference built from the same packed bytes + grouped scales. Covers
    output-dim padding (n=520) and a group smaller than the block."""
    from infinite_video_tpu.ops.pallas.quant_matmul import quant_matmul_int4

    rng = np.random.default_rng(1)
    # (2, 2048, ...) exercises nkb>1 (multiple packed-k blocks), the case
    # where block-local vs global scale-row indexing differ
    for (m, k, n, g) in [(1, 512, 384, 128), (8, 256, 520, 64),
                         (2, 2048, 256, 128)]:
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
        q = quantize_decoder_params({"q_proj": {"kernel": w}},
                                    targets=r"q_proj/kernel$", bits=4,
                                    group_size=g)["q_proj"]
        packed = q["kernel_q"]
        low = ((packed.astype(np.int16) << 4).astype(np.int8) >> 4)
        high = packed >> 4
        w4 = np.concatenate([low, high], axis=0).astype(np.float32)
        wdq = w4 * np.repeat(q["scale"], g, axis=0)
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        ref = np.asarray(x, np.float32) @ wdq
        got = np.asarray(quant_matmul_int4(
            x, jnp.asarray(packed), jnp.asarray(q["scale"]), group=g,
            out_dtype=jnp.float32, interpret=True))
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


def test_int4_grouped_quantization():
    """int4 weight-only with per-(input-group, output-channel) scales:
    quarter-size kernels, argmax mostly agrees, generation runs."""
    from infinite_video_tpu.models.quantized import QuantDecoder

    cfg, model, params, _, ids = _setup()
    q4 = quantize_decoder_params(params, bits=4, group_size=32)
    l0 = q4["layer_0"]["q_proj"]
    # packed storage: two int4 nibbles per int8 byte along the input dim
    assert l0["kernel_q"].dtype == np.int8
    assert l0["kernel_q"].shape == (64 // 2, 64)
    assert l0["scale"].shape == (64 // 32, 64)

    ref, _ = model.apply({"params": params}, input_ids=ids)
    m4 = QuantDecoder(cfg, bits=4)
    assert m4.cfg.quant_bits == 4
    import dataclasses as dc

    m4 = QuantDecoder(dc.replace(cfg, quant_group=32), bits=4)
    qlogits, _ = m4.apply({"params": q4}, input_ids=ids)
    ref, qlogits = np.asarray(ref), np.asarray(qlogits)
    # random tiny weights have near-zero logit margins, so argmax agreement
    # is a weak signal at this scale (real checkpoints separate much more);
    # the grid roundtrip test below is the exact correctness check
    agree = (ref.argmax(-1) == qlogits.argmax(-1)).mean()
    assert agree >= 0.6, f"argmax agreement {agree}"
    rel = np.abs(ref - qlogits).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.25, f"mean relative error {rel}"

    out = generate(m4, q4, GenerationConfig(max_new_tokens=5, eos_token_id=-1),
                   prompt_ids=ids)
    assert np.isfinite(np.asarray(out)).all()


def test_int4_dequant_roundtrip_exact():
    """Nibble pack/unpack roundtrip: the QuantDense unpack (shift pair +
    grouped scales) reconstructs the quantizer's grid exactly, and the grid
    is within half a quantization step of the source weights."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(96, 40)).astype(np.float32) * 0.1
    q4 = quantize_decoder_params({"q_proj": {"kernel": w}},
                                 targets=r"q_proj/kernel$",
                                 bits=4, group_size=32)["q_proj"]
    packed = q4["kernel_q"].astype(np.int8)
    # the exact unpack QuantDense performs (half-split along the input dim:
    # low nibble = row i, high nibble = row i + K/2)
    low = ((packed.astype(np.int16) << 4).astype(np.int8) >> 4)
    high = packed >> 4
    vals = np.concatenate([low, high], axis=0).astype(np.float32)
    got = vals * np.repeat(q4["scale"], 32, axis=0)
    # quantization error bounded by half a step per element
    step = np.repeat(q4["scale"], 32, axis=0)
    assert (np.abs(got - w) <= step / 2 + 1e-7).all()
    assert np.abs(vals).max() <= 8
