"""Composite-pipeline golden parity: the reference's *composed* encode chains
(torch, traced by tools/gen_golden_pipeline.py at tiny-but-faithful geometry)
vs our JAX encoders running the *converted* checkpoint.

Covers the glue that component goldens can't: frame-token rearranges,
ln_vision placement/eps, query-token expansion, the new_video/LTM-state
protocol across chunks, the mean-over-chunks eval protocol
(run_inference_inf_video_llama_nextqa.py:184-194), and the mistral_proj
[:, :n_query] slice (videochat2_it_mistral.py:252). Sticky Categorical draws
recorded from torch are replayed bit-for-bit via `sticky_bins`.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinite_video_tpu.convert.checkpoints import (
    assemble_infvideollama_params, assemble_videochat2_params)
from infinite_video_tpu.models.decoder import DecoderConfig
from infinite_video_tpu.models.infinite_videollama import (
    InfVideoLLaMAConfig, InfVideoLLaMAEncoder)
from infinite_video_tpu.models.qformer import QFormerConfig, init_ltm_states
from infinite_video_tpu.models.videochat2 import VideoChat2Config, VideoChat2Encoder
from infinite_video_tpu.models.vit import ViTConfig
from infinite_video_tpu.ops.ltm import LTMConfig
from tests.conftest import GOLDEN_DIR

TINY_DECODER = DecoderConfig(vocab_size=128, hidden_size=96, num_layers=1,
                             num_heads=4, num_kv_heads=4, intermediate_size=192)


def _load_fixture(name):
    d = np.load(os.path.join(GOLDEN_DIR, name))
    sd = {k[len("sd."):]: d[k] for k in d.files if k.startswith("sd.")}
    return d, sd


def _save_pth(sd, tmpdir, name="composite.pth"):
    import torch

    path = os.path.join(tmpdir, name)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
    return path


def _bins(d, idx):
    """Recorded torch draw [S, 1] -> [1, S] int32 for sticky_bins replay."""
    return jnp.asarray(d[f"bins{idx}"].T.astype(np.int32))


# Geometry mirrors tools/gen_golden_pipeline.py (which in turn honours the
# reference's hard-coded 32x768 / 196x1024 LTM pooling shapes).

def _infvideollama_cfg():
    ltm = LTMConfig(num_basis=16, chunk_len=4, tokens_per_frame=32,
                    feature_dim=768, hidden_size=64, num_heads=4, tau=0.75,
                    sticky=True)
    return InfVideoLLaMAConfig(
        vit=ViTConfig(img_size=28, patch_size=14, embed_dim=48, depth=2,
                      num_heads=4, mlp_hidden=96, use_cls_token=True,
                      pos_embed="learned", final_ln=False),
        frame_qformer=QFormerConfig(hidden_size=768, num_layers=2, num_heads=12,
                                    intermediate_size=3072, encoder_width=48,
                                    cross_attention_freq=2, query_length=32,
                                    alpha=1.0, ltm=None),
        video_qformer=QFormerConfig(hidden_size=64, num_layers=2, num_heads=4,
                                    intermediate_size=128, encoder_width=768,
                                    cross_attention_freq=1, query_length=8,
                                    alpha=0.5, ltm=ltm),
        decoder=TINY_DECODER, num_query_token=32, num_video_query_token=8)


def _videochat2_cfg():
    ltm = LTMConfig(num_basis=16, chunk_len=2, tokens_per_frame=196,
                    feature_dim=1024, hidden_size=64, num_heads=4, tau=0.75,
                    sticky=True)
    return VideoChat2Config(
        vit=ViTConfig(img_size=224, patch_size=16, embed_dim=1024, depth=2,
                      num_heads=4, mlp_hidden=1024, use_cls_token=False,
                      pos_embed="sinusoid", num_frames=2, ckpt_num_frame=2,
                      final_ln=True),
        qformer=QFormerConfig(hidden_size=64, num_layers=2, num_heads=4,
                              intermediate_size=128, encoder_width=1024,
                              cross_attention_freq=2, query_length=12,
                              vocab_size=512, alpha=0.5, ltm=ltm),
        decoder=TINY_DECODER, num_query_token=8, extra_num_query_token=4)


def test_infvideollama_composed_encode_matches_reference():
    d, sd = _load_fixture("pipeline_infvideollama.npz")
    cfg = _infvideollama_cfg()
    enc = InfVideoLLaMAEncoder(cfg)

    states0 = init_ltm_states(cfg.video_qformer, batch=1)
    pixels0 = jnp.asarray(d["pixels0"].transpose(0, 2, 3, 4, 1))  # BCTHW->BTHWC
    variables = enc.init(jax.random.PRNGKey(0), pixels0, states0)

    report = {}
    with tempfile.TemporaryDirectory() as td:
        path = _save_pth(sd, td)
        params, _ = assemble_infvideollama_params(
            variables["params"], [path], report=report)
    assert report.get(path, []) == []  # every reference key consumed

    apply = jax.jit(lambda p, x, s, bins: enc.apply(
        {"params": p}, x, s, sticky_bins=bins))

    states = states0
    embs = []
    for i in range(int(d["num_chunks"])):
        pixels = jnp.asarray(d[f"pixels{i}"].transpose(0, 2, 3, 4, 1))
        bins = ()
        if i > 0:  # chunk-major, then cross-layer order (2 cross layers)
            bins = (_bins(d, 2 * (i - 1)), _bins(d, 2 * (i - 1) + 1))
        emb, states = apply(params, pixels, states, bins)
        embs.append(np.asarray(emb, np.float32))
        np.testing.assert_allclose(embs[-1], d[f"emb{i}"],
                                   rtol=5e-4, atol=2e-5)
    # mean-over-chunks eval protocol (nextqa driver)
    np.testing.assert_allclose(np.mean(np.stack(embs), axis=0), d["mean_emb"],
                               rtol=5e-4, atol=2e-5)


def test_videochat2_composed_encode_matches_reference():
    d, sd = _load_fixture("pipeline_videochat2.npz")
    cfg = _videochat2_cfg()
    enc = VideoChat2Encoder(cfg)

    states0 = init_ltm_states(cfg.qformer, batch=1)
    ids = jnp.asarray(d["input_ids"].astype(np.int32))
    mask = jnp.asarray(d["attn_mask"].astype(np.float32))
    pixels0 = jnp.asarray(d["pixels0"].transpose(0, 1, 3, 4, 2))  # BTCHW->BTHWC
    variables = enc.init(jax.random.PRNGKey(0), pixels0, states0,
                         instruction_ids=ids, instruction_mask=mask)

    report = {}
    with tempfile.TemporaryDirectory() as td:
        path = _save_pth(sd, td)
        params, _ = assemble_videochat2_params(
            variables["params"], [path], report=report)
    assert report.get(path, []) == []

    apply = jax.jit(lambda p, x, s, bins: enc.apply(
        {"params": p}, x, s, instruction_ids=ids, instruction_mask=mask,
        sticky_bins=bins))

    states = states0
    embs = []
    for i in range(int(d["num_chunks"])):
        pixels = jnp.asarray(d[f"pixels{i}"].transpose(0, 1, 3, 4, 2))
        bins = (_bins(d, i - 1),) if i > 0 else ()  # single cross layer
        emb, states = apply(params, pixels, states, bins)
        embs.append(np.asarray(emb, np.float32))
        np.testing.assert_allclose(embs[-1], d[f"emb{i}"],
                                   rtol=5e-4, atol=2e-5)
    # per-chunk-mean protocol (run_nextqa_mistral.py:141-152)
    np.testing.assert_allclose(np.mean(np.stack(embs), axis=0), d["mean_emb"],
                               rtol=5e-4, atol=2e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
