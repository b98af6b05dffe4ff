"""Checkpoint assembly tests: reference-prefix routing, strict=False overlay,
LoRA merge, orbax train-state roundtrip."""

import numpy as np
import pytest

from infinite_video_tpu.convert import checkpoints as ck
from infinite_video_tpu.convert.decoder import merge_lora


def test_split_reference_checkpoint_routing():
    sd = {
        "visual_encoder.cls_token": np.zeros((1, 1, 8)),
        "ln_vision.weight": np.ones(8),
        "ln_vision.bias": np.zeros(8),
        "Qformer.bert.encoder.layer.0.attention.self.query.weight": np.zeros((8, 8)),
        "video_Qformer.bert.encoder.layer.0.attention.self.query.weight": np.zeros((8, 8)),
        "query_tokens": np.zeros((1, 4, 8)),
        "video_query_tokens": np.zeros((1, 4, 8)),
        "video_frame_position_embedding.weight": np.zeros((32, 8)),
        "llama_proj.weight": np.zeros((16, 8)),
        "llama_proj.bias": np.zeros(16),
        "llama_model.model.embed_tokens.weight": np.zeros((10, 16)),
        "something_else.weight": np.zeros(3),
    }
    comps = ck.split_reference_checkpoint(sd)
    assert "cls_token" in comps["visual_encoder"]
    assert "weight" in comps["ln_vision"]
    assert any(k.startswith("bert.") for k in comps["qformer"])
    assert any(k.startswith("bert.") for k in comps["video_qformer"])
    assert comps["llama_proj"]["weight"].shape == (16, 8)
    assert "model.embed_tokens.weight" in comps["decoder"]
    assert "something_else.weight" in comps["other"]


def test_assemble_overlay_is_strict_false(tmp_path):
    torch = pytest.importorskip("torch")
    # Partial checkpoint: only llama_proj + query_tokens; everything else must
    # keep its initialization.
    sd = {
        "llama_proj.weight": torch.full((16, 8), 2.0),
        "llama_proj.bias": torch.zeros(16),
        "query_tokens": torch.full((1, 4, 8), 3.0),
    }
    path = str(tmp_path / "part.pth")
    torch.save({"model": sd}, path)

    init = {
        "llama_proj": {"kernel": np.zeros((8, 16), np.float32),
                       "bias": np.ones(16, np.float32)},
        "query_tokens": np.zeros((1, 4, 8), np.float32),
        "Qformer": {"layer_0": {"attention": {"query": {
            "kernel": np.full((8, 8), 7.0, np.float32)}}}},
    }
    params, dec = ck.assemble_infvideollama_params(init, [path])
    assert dec is None
    assert (params["llama_proj"]["kernel"] == 2.0).all()
    assert (params["query_tokens"] == 3.0).all()
    # untouched by the partial checkpoint:
    assert (params["Qformer"]["layer_0"]["attention"]["query"]["kernel"] == 7.0).all()
    assert (params["llama_proj"]["bias"] == 0.0).all()  # bias came from ckpt


def test_merge_lora_folds_adapters():
    base = np.eye(4, dtype=np.float32)
    A = np.ones((2, 4), np.float32)   # [r, in]
    B = np.ones((4, 2), np.float32)   # [out, r]
    sd = {
        "model.layers.0.self_attn.q_proj.base_layer.weight": base,
        "model.layers.0.self_attn.q_proj.lora_A.weight": A,
        "model.layers.0.self_attn.q_proj.lora_B.weight": B,
    }
    out = merge_lora(sd, lora_alpha=4, r=2)
    merged = out["model.layers.0.self_attn.q_proj.weight"]
    np.testing.assert_allclose(merged, base + 2.0 * (B @ A))


def test_orbax_train_state_roundtrip(tmp_path):
    import jax.numpy as jnp

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(5)}
    path = ck.save_train_state(str(tmp_path / "ckpts"), 5, state)
    template = {"params": {"w": jnp.zeros((2, 3))}, "step": jnp.asarray(0)}
    restored, step = ck.restore_train_state(str(tmp_path / "ckpts"), template)
    assert step == 5
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    none, step = ck.restore_train_state(str(tmp_path / "empty"), template)
    assert none is None and step == -1
