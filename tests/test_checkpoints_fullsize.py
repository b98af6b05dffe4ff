"""Full-geometry checkpoint-conversion validation (slow, CPU).

Round-1 parity ran at tiny/random geometry only; key-naming or shape drift
against the *real* EVA-g / UMT-L / 7B layouts would load wrong weights with
no error. These tests drive the reference torch modules at released-checkpoint
geometry (random init — released weights are not vendored), convert their
state_dicts, and assert:

  1. zero unconsumed source keys (converters report leftovers now),
  2. the converted tree is structurally identical (paths + shapes) to the
     flax model's own init tree,
  3. fp32 logits/hidden parity vs torch.

Reference geometries: EVA-g create_eva_vit_g (eva_vit.py:388-423, 1408x39,
qkv-bias layout), UMT-L build_vit (blip2/vit.py:408-427, 1024x24), Mistral-7B
layer geometry (videochat2_it_mistral.py:114-158) + stage-3 LoRA merge
(run_nextqa_mistral.py:470-487).
"""

import gc
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools")
sys.path.insert(0, TOOLS)

needs_reference = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo unavailable")


def _tree_paths_shapes(tree):
    return {jax.tree_util.keystr(p): tuple(x.shape) for p, x in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _assert_tree_matches_init(params, init_shapes):
    got = _tree_paths_shapes(params)
    missing = set(init_shapes) - set(got)
    extra = set(got) - set(init_shapes)
    assert not missing, f"params missing from checkpoint: {sorted(missing)[:8]}"
    assert not extra, f"converted keys not in model: {sorted(extra)[:8]}"
    for k, s in got.items():
        assert s == init_shapes[k], (k, s, init_shapes[k])


@needs_reference
def test_eva_g_fullsize_conversion_and_forward():
    import torch
    from functools import partial

    from gen_golden_vit import _load, _stub_modules

    from infinite_video_tpu.convert.vit import convert_vit_state_dict
    from infinite_video_tpu.models.vit import VisionTransformer, eva_vit_g_config

    _stub_modules()
    eva = _load("/root/reference/infty-Video-LLaMA/InfVideoLLaMA/models/eva_vit.py",
                "_ref_eva_vit_full")
    torch.manual_seed(0)
    # exact create_eva_vit_g geometry (eva_vit.py:399-412), drop_path 0 at eval
    model = eva.VisionTransformer(
        img_size=224, patch_size=14, use_mean_pooling=False, embed_dim=1408,
        depth=39, num_heads=1408 // 88, mlp_ratio=4.3637, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6))
    model.eval()
    x = torch.randn(1, 3, 224, 224) * 0.5
    with torch.no_grad():
        ref = model(x).numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model
    gc.collect()

    lost: list = []
    params = convert_vit_state_dict(sd, unconsumed=lost)
    assert lost == [], lost[:8]

    cfg = eva_vit_g_config()
    flax_model = VisionTransformer(cfg)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    init_shapes = _tree_paths_shapes(
        jax.eval_shape(flax_model.init, jax.random.PRNGKey(0), xj)["params"])
    _assert_tree_matches_init(params, init_shapes)

    y = flax_model.apply({"params": params}, xj)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=3e-4, atol=3e-4)


@needs_reference
def test_umt_l_fullsize_conversion_and_forward():
    import torch

    from gen_golden_vit import _load, _stub_modules

    from infinite_video_tpu.convert.vit import convert_vit_state_dict
    from infinite_video_tpu.models.vit import VisionTransformer, umt_vit_l_config

    _stub_modules()
    vit = _load("/root/reference/infty-VideoChat2/models/blip2/vit.py",
                "_ref_umt_full")
    torch.manual_seed(1)
    # build_vit geometry (vit.py:408-427): ViT-L/16, 1024x24, mlp 4096
    model = vit.PretrainVisionTransformer(
        img_size=224, patch_size=16, encoder_embed_dim=1024, encoder_depth=24,
        encoder_num_heads=16, mlp_ratio=4.0, qkv_bias=True, num_frames=4,
        tubelet_size=1, ckpt_num_frame=4, with_ln=True, return_index=-1)
    model.eval()
    x = torch.randn(1, 3, 4, 224, 224) * 0.5
    with torch.no_grad():
        ref = model(x).numpy()  # [B, T, L, C]
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model
    gc.collect()

    lost: list = []
    params = convert_vit_state_dict(sd, unconsumed=lost)
    assert lost == [], lost[:8]

    cfg = umt_vit_l_config(num_frames=4)
    flax_model = VisionTransformer(cfg)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # NCTHW -> NTHWC
    init_shapes = _tree_paths_shapes(
        jax.eval_shape(flax_model.init, jax.random.PRNGKey(0), xj)["params"])
    _assert_tree_matches_init(params, init_shapes)

    y = flax_model.apply({"params": params}, xj)
    np.testing.assert_allclose(np.asarray(y),
                               ref.reshape(ref.shape[0], -1, ref.shape[-1]),
                               rtol=3e-4, atol=3e-4)


@needs_reference
def test_qformer_12layer_fullsize_conversion_and_forward():
    """Full VC2 Q-former: 12 layers, freq=2, 1024-wide cross-attention,
    96 query tokens + text (blip2/blip2.py:47-77)."""
    import torch

    from gen_golden_qformer import build, load_reference_qformer

    from infinite_video_tpu.convert.qformer import (convert_lm_head_state_dict,
                                                    convert_qformer_state_dict)
    from infinite_video_tpu.models.qformer import QFormer, QFormerConfig

    Q = load_reference_qformer()
    torch.manual_seed(2)
    model = build(Q, num_layers=12, freq=2, encoder_width=1024, num_basis=64,
                  alpha=1.0, sticky=False, query_len=96)

    query = torch.randn(1, 96, 768) * 0.5
    chunk = torch.randn(1, 784, 1024) * 0.5
    input_ids = torch.randint(0, 30522, (1, 10))
    attn_mask = torch.ones(1, 96 + 10)
    with torch.no_grad():
        ref = model.bert(
            input_ids=input_ids, attention_mask=attn_mask, query_embeds=query,
            encoder_hidden_states=chunk,
            encoder_attention_mask=torch.ones(1, chunk.shape[1]),
            new_video=True, return_dict=True).last_hidden_state.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model
    gc.collect()

    lost: list = []
    params = convert_qformer_state_dict(sd, unconsumed=lost)
    assert lost == [], lost[:8]
    # the cls head keys are owned by the LM-head converter; together the two
    # converters must consume the complete state_dict
    head = convert_lm_head_state_dict(sd)
    assert head, "cls head keys not converted"

    cfg = QFormerConfig(num_layers=12, cross_attention_freq=2,
                        encoder_width=1024, query_length=96, alpha=1.0,
                        ltm=None)
    flax_model = QFormer(cfg)
    out, _ = flax_model.apply(
        {"params": params}, query_embeds=jnp.asarray(query.numpy()),
        encoder_hidden_states=jnp.asarray(chunk.numpy()),
        ltm_states=(), input_ids=jnp.asarray(input_ids.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-5)


@needs_reference
def test_decoder_7b_width_conversion_lora_and_forward():
    """Mistral-7B true layer geometry (4096 wide, GQA 32/8, mlp 14336) at
    2 layers: per-layer naming/shape/transpose drift shows up identically at
    any depth. Includes the stage-3 LoRA merge path at full width."""
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    from infinite_video_tpu.convert.decoder import (convert_decoder_state_dict,
                                                    merge_lora)
    from infinite_video_tpu.models.decoder import Decoder, DecoderConfig

    torch.manual_seed(3)
    hf_cfg = MistralConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=2, num_attention_heads=32, num_key_value_heads=8,
        rms_norm_eps=1e-5, rope_theta=10000.0, attn_implementation="eager",
        tie_word_embeddings=False, sliding_window=None)
    hf = MistralForCausalLM(hf_cfg)
    hf.eval()
    ids = np.random.default_rng(3).integers(0, 32000, (1, 9))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    del hf
    gc.collect()

    lost: list = []
    params = convert_decoder_state_dict(sd, unconsumed=lost)
    assert lost == [], lost[:8]

    cfg = DecoderConfig(vocab_size=32000, hidden_size=4096,
                        intermediate_size=14336, num_layers=2, num_heads=32,
                        num_kv_heads=8, rms_eps=1e-5, dtype=jnp.float32)
    model = Decoder(cfg)
    init_shapes = _tree_paths_shapes(jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids, jnp.int32))["params"])
    _assert_tree_matches_init(params, init_shapes)

    logits, _ = model.apply({"params": params},
                            input_ids=jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-3)

    # LoRA merge at full width, peft stage-3 naming
    # (mistral_model.base_model.model.model.layers..., r=16, alpha=32)
    rng = np.random.default_rng(4)
    A = rng.normal(size=(16, 4096)).astype(np.float32) * 0.01
    B = rng.normal(size=(4096, 16)).astype(np.float32) * 0.01
    pfx = "mistral_model.base_model.model.model.layers.0.self_attn.q_proj"
    merged_sd = merge_lora(
        {**sd, f"{pfx}.lora_A.weight": A, f"{pfx}.lora_B.weight": B},
        lora_alpha=32.0, r=16)
    merged = convert_decoder_state_dict(merged_sd)
    want = (sd["model.layers.0.self_attn.q_proj.weight"]
            + 2.0 * (B @ A)).T
    np.testing.assert_allclose(
        merged["layer_0"]["q_proj"]["kernel"], want, rtol=1e-5, atol=1e-6)


@needs_reference
def test_layered_overlay_reports_every_key():
    """4-stage strict=False overlay (infinityqa.py:530-539): stage files with
    real component routing; report must be empty when every key is consumable
    and must flag alien keys."""
    import tempfile

    import torch

    from infinite_video_tpu.convert.checkpoints import (
        assemble_infvideollama_params)

    torch.manual_seed(5)
    with tempfile.TemporaryDirectory() as td:
        p1 = os.path.join(td, "blip2_pretrained.pth")
        torch.save({"model": {
            "Qformer.bert.embeddings.LayerNorm.weight": torch.ones(768),
            "Qformer.bert.embeddings.LayerNorm.bias": torch.zeros(768),
            "query_tokens": torch.zeros(1, 32, 768),
        }}, p1)
        p2 = os.path.join(td, "finetune.pth")
        torch.save({"model": {
            "llama_proj.weight": torch.zeros(8, 768),
            "llama_proj.bias": torch.zeros(8),
            "video_query_tokens": torch.zeros(1, 32, 768),
            "video_frame_position_embedding.weight": torch.zeros(32, 768),
            "alien.weight": torch.zeros(3),                 # must be reported
            "visual_encoder.blocks.0.attn.unknown": torch.zeros(3),  # ditto
        }}, p2)

        report: dict = {}
        params, _ = assemble_infvideollama_params({}, [p1, p2], report=report)
    assert report.get(p1, []) == []
    assert sorted(report[p2]) == ["alien.weight",
                                  "visual_encoder.blocks.0.attn.unknown"]
    assert "llama_proj" in params and "video_query_tokens" in params
