"""int8 KV cache (DecoderConfig.kv_quant): quantize-on-write, dequantize-at-
read with per-(batch, position, kv-head) symmetric scales. Serving capacity
lane — halves KV HBM for long-video chat sessions."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.models.decoder import (Decoder, KVCache,
                                               _kv_dequantize, _kv_quantize,
                                               init_kv_cache,
                                               tiny_decoder_config)


def test_kv_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3, 16),
                          jnp.float32) * 3.0
    q, scale = _kv_quantize(x)
    assert q.dtype == jnp.int8
    back = _kv_dequantize(q, scale)
    # symmetric rounding: per-element error <= half a quantization step
    err = np.abs(np.asarray(back) - np.asarray(x))
    bound = np.asarray(scale)[..., None] / 2 + 1e-7
    assert (err <= bound).all()


def test_int8_cache_memory_halves():
    cfg = tiny_decoder_config(dtype=jnp.bfloat16)
    qcfg = dataclasses.replace(cfg, kv_quant=True)
    full = init_kv_cache(cfg, batch=2, max_len=64)
    quant = init_kv_cache(qcfg, batch=2, max_len=64)
    assert quant.k[0].dtype == jnp.int8 and quant.k_scale is not None
    nbytes = lambda planes: sum(p.nbytes for p in planes)
    fp_bytes = nbytes(full.k) + nbytes(full.v)
    q_bytes = (nbytes(quant.k) + nbytes(quant.v)
               + nbytes(quant.k_scale) + nbytes(quant.v_scale))
    assert q_bytes < 0.6 * fp_bytes
    # pytree plumbing used by generation/spec-decode: pos rewind keeps scales
    rewound = quant.replace(pos=jnp.int32(3))
    assert rewound.k_scale is quant.k_scale


def test_kv_quant_decode_matches_fp_cache():
    """Greedy prefill+decode with the int8 cache tracks the fp cache: logits
    drift stays within the quantization budget and the argmax path is
    identical on a tiny decoder."""
    cfg = tiny_decoder_config(dtype=jnp.float32)
    qcfg = dataclasses.replace(cfg, kv_quant=True)
    model = Decoder(cfg)
    qmodel = Decoder(qcfg)
    ids0 = jnp.array([[1, 7, 42, 5]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids0)["params"]

    def decode(m, c, steps=8):
        logits, cache = m.apply(
            {"params": params}, input_ids=ids0,
            attention_mask=jnp.ones((1, c.max_len)), cache=c)
        tok = jnp.argmax(logits[:, -1], axis=-1)
        toks, logs = [tok], [logits[:, -1]]
        for _ in range(steps):
            logits, cache = m.apply(
                {"params": params}, input_ids=tok[:, None],
                attention_mask=jnp.ones((1, c.max_len)), cache=cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)
            toks.append(tok)
            logs.append(logits[:, -1])
        return np.asarray(jnp.stack(toks)), np.asarray(jnp.stack(logs))

    max_len = ids0.shape[1] + 9
    toks_fp, logs_fp = decode(model, init_kv_cache(cfg, 1, max_len))
    toks_q, logs_q = decode(qmodel, init_kv_cache(qcfg, 1, max_len))
    np.testing.assert_array_equal(toks_q, toks_fp)
    drift = np.abs(logs_q - logs_fp).max()
    assert drift < 0.05, drift


def test_kv_quant_flash_prefill_path():
    """use_flash + fresh cache: the flash prefill never reads the quantized
    buffer, so the prefill logits are bit-identical to the fp-cache flash
    prefill; the buffer still fills with quantized rows for later steps."""
    cfg = tiny_decoder_config(dtype=jnp.float32, use_flash=True,
                              flash_interpret=True)
    qcfg = dataclasses.replace(cfg, kv_quant=True)
    ids0 = jnp.array([[3, 9, 11, 2, 8]], jnp.int32)
    params = Decoder(cfg).init(jax.random.PRNGKey(1), input_ids=ids0)["params"]
    lf, cf = Decoder(cfg).apply({"params": params}, input_ids=ids0,
                                cache=init_kv_cache(cfg, 1, 12))
    lq, cq = Decoder(qcfg).apply({"params": params}, input_ids=ids0,
                                 cache=init_kv_cache(qcfg, 1, 12))
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(lf))
    assert cq.k[0].dtype == jnp.int8
    assert int(cq.pos) == int(cf.pos) == ids0.shape[1]
    # the written rows dequantize back to the fp rows within the step bound
    # (layer-0 plane; KVCache stores per-layer tuples)
    back = _kv_dequantize(cq.k[0][:, :5], cq.k_scale[0][:, :5])
    np.testing.assert_allclose(np.asarray(back),
                               np.asarray(cf.k[0][:, :5], np.float32),
                               atol=np.asarray(cq.k_scale[0]).max() / 2 + 1e-6)


def test_cli_kv_int8_flag_through_build_engine():
    """--kv-int8 flips DecoderConfig.kv_quant through build_engine, composes
    with weight quantization flags, and the engine still answers (greedy
    output matches the fp-cache engine on the tiny decoder)."""
    import jax.numpy as jnp

    from infinite_video_tpu.cli.run_eval import build_engine
    from infinite_video_tpu.cli.serve import build_argparser

    base = ["--tiny", "--max-int", "2", "--num-samples", "2",
            "--num-basis", "16"]
    args = build_argparser().parse_args(base)
    engine, cfg = build_engine(args)
    assert not engine.decoder.cfg.kv_quant
    emb = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(0),
                          (1, 4, cfg.decoder.hidden_size)) * 0.1)
    plain = engine.answer(emb, "what happens?", max_new_tokens=10,
                          do_sample=False)

    args_q = build_argparser().parse_args(base + ["--kv-int8"])
    engine_q, _ = build_engine(args_q)
    assert engine_q.decoder.cfg.kv_quant
    # weight-quant flags in the cfg survive the kv_quant replace
    import dataclasses as dc

    qcfg = dc.replace(engine_q.decoder.cfg, quantized=True)
    assert qcfg.kv_quant and qcfg.quantized
    engine_q.enc_params = engine.enc_params
    engine_q.dec_params = engine.dec_params
    quant = engine_q.answer(emb, "what happens?", max_new_tokens=10,
                            do_sample=False)
    assert quant == plain


def test_int4_weights_with_int8_kv_cache():
    """The deepest serving point (bench decode_tok_s_8k_b8_int4_kv_int8):
    int4 grouped weights AND the int8 KV cache in one config decode without
    error and track the int8-weight/int8-KV path's tokens on a tiny model."""
    from infinite_video_tpu.models.quantized import quantize_decoder_params

    cfg = tiny_decoder_config(dtype=jnp.float32)
    fp = Decoder(cfg)
    ids0 = jnp.array([[1, 7, 42, 5]], jnp.int32)
    fp_params = fp.init(jax.random.PRNGKey(0), input_ids=ids0)["params"]

    def decode(qcfg, params, steps=6):
        m = Decoder(qcfg)
        max_len = ids0.shape[1] + steps + 1
        cache = init_kv_cache(qcfg, 1, max_len)
        logits, cache = m.apply(
            {"params": params}, input_ids=ids0,
            attention_mask=jnp.ones((1, max_len)), cache=cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)
        toks = [tok]
        for _ in range(steps):
            logits, cache = m.apply(
                {"params": params}, input_ids=tok[:, None],
                attention_mask=jnp.ones((1, max_len)), cache=cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)
            toks.append(tok)
        return np.asarray(jnp.stack(toks))

    qparams = quantize_decoder_params(fp_params, bits=4, group_size=32)
    out = {}
    for kvq in (False, True):
        qcfg = dataclasses.replace(cfg, quantized=True, kv_quant=kvq,
                                   quant_bits=4, quant_group=32)
        out[kvq] = decode(qcfg, qparams)
    # same int4 weights; only the KV representation differs — per-row int8
    # KV drift must not flip the greedy path on a tiny model
    np.testing.assert_array_equal(out[True], out[False])
