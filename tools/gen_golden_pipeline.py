"""Golden fixtures for the *composed* encode pipelines, driven end-to-end on
the reference torch code.

Component-level goldens (LTM / Q-former / ViT) leave the composition glue
untested: frame-token rearranges, ln_vision placement/eps, query-token
expansion, the mean-over-chunks eval protocol, and the mistral_proj query
slice. This generator replays the reference's full encode chains at
tiny-but-faithful geometry with seeded weights and saves (state_dict, pixel
chunks, recorded sticky draws, per-chunk embeddings, chunk-mean) so the JAX
encoders can assert fp32 parity through the *converted* checkpoint:

  pipeline_infvideollama.npz
      InfinityQA.encode_short_memory_frame -> encode_video over 3 chunks
      (infty-Video-LLaMA/InfVideoLLaMA/models/infinityqa.py:251-344) plus the
      mean-over-chunks protocol
      (eval_code/eval/run_inference_inf_video_llama_nextqa.py:184-194).
  pipeline_videochat2.npz
      VideoChat2_it_mistral.encode_img with instruction text over 3 chunks
      (infty-VideoChat2/models/videochat_mistra/videochat2_it_mistral.py:181-253)
      incl. the [:, :n_query] slice, plus the per-chunk-mean protocol
      (eval_code/run_nextqa_mistral.py:141-152).

Geometry constraints honoured from the reference (hard-coded there):
  - ∞-Video-LLaMA LTM pools k.reshape(B, -1, 32, 768).mean(2)
    (long_term_attention_gibbs.py:291,304) -> frame Q-former hidden must be
    768 with 32 query tokens/frame; the video Q-former shrinks to 64-hidden.
  - ∞-VideoChat2 LTM pools over 196 patches x 1024 features -> UMT ViT embeds
    at 1024; the Q-former shrinks to 64-hidden.
Everything runs fp32 (the reference's .half()/autocast casts are CUDA-only
artifacts; composition parity is an fp32 claim).

Usage: python tools/gen_golden_pipeline.py
"""

import importlib.util
import math
import os
import sys
import tempfile
import types
from functools import partial

import numpy as np
import torch
import torch.nn as nn

TOOLS = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(TOOLS, "..", "tests", "golden")
sys.path.insert(0, TOOLS)

import gen_golden_qformer  # noqa: E402  (reference Qformer loader + shims)
import gen_golden_vit  # noqa: E402      (timm / InfVideoLLaMA stubs)

REF_VL = "/root/reference/infty-Video-LLaMA/InfVideoLLaMA/models"
REF_VC2 = "/root/reference/infty-VideoChat2/models/blip2"


def _load(path, modname):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_vc2_qformer():
    """Import the VC2 copy of Qformer.py (+ its LTM pair) as a package."""
    pkg = types.ModuleType("_vc2blip")
    pkg.__path__ = [REF_VC2]
    sys.modules["_vc2blip"] = pkg
    for name in ("basis_functions", "long_term_attention_gibbs", "Qformer"):
        _load(os.path.join(REF_VC2, f"{name}.py"), f"_vc2blip.{name}")
    return sys.modules["_vc2blip.Qformer"]


class _DrawRecorder:
    """Patch torch.distributions.Categorical inside an LTM module to record
    the 127-bin sticky draws (same mechanism as tools/gen_golden_ltm.py)."""

    def __init__(self, ltm_module):
        self.mod = ltm_module
        self.draws = []

    def __enter__(self):
        real = torch.distributions.Categorical
        draws = self.draws

        class RecordingCategorical(real):
            def sample(self, shape=torch.Size()):
                s = super().sample(shape)
                if self.probs.dim() == 2:
                    draws.append(s.numpy().copy())
                return s

        self._real = real
        self.mod.dist.Categorical = RecordingCategorical
        return self

    def __exit__(self, *exc):
        self.mod.dist.Categorical = self._real


def _set_ltm_cpu(bert_encoder):
    for layer in bert_encoder.layer:
        if getattr(layer, "crossattention", None) is not None:
            layer.crossattention.self.long_term_attention.device = "cpu"


def _bert_config(**over):
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig()
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


# ---------------------------------------------------------------- case A ---


class InfinityQATiny(nn.Module):
    """Tiny-geometry replica of InfinityQA's module layout (infinityqa.py:95-215):
    same child names (so state_dict keys match the reference checkpoints the
    converters expect), same nulling of unused Q-former halves."""

    def __init__(self, Q, eva):
        super().__init__()
        torch.manual_seed(11)
        # blip2.py:66-77: EVA ViT + fp32 LayerNorm (default eps=1e-5)
        self.visual_encoder = eva.VisionTransformer(
            img_size=28, patch_size=14, embed_dim=48, depth=2, num_heads=4,
            mlp_ratio=2.0, qkv_bias=True, use_mean_pooling=False,
            norm_layer=partial(nn.LayerNorm, eps=1e-6))
        self.ln_vision = nn.LayerNorm(48)

        # init_Qformer (blip2.py:48-65): bert-base geometry, LTM nulled
        fq_cfg = _bert_config(num_hidden_layers=2, encoder_width=48,
                              add_cross_attention=True, cross_attention_freq=2,
                              query_length=32, num_basis=None, sticky=None,
                              sigmas=None, tau=None, alpha=None)
        self.Qformer = Q.BertLMHeadModel(config=fq_cfg)
        self.Qformer.cls = None
        self.Qformer.bert.embeddings.word_embeddings = None
        self.Qformer.bert.embeddings.position_embeddings = None
        for layer in self.Qformer.bert.encoder.layer:
            layer.output = None
            layer.intermediate = None
        self.query_tokens = nn.Parameter(torch.zeros(1, 32, 768))
        self.query_tokens.data.normal_(std=0.02)

        # infinityqa.py:202-215: frame position table + live-LTM video Q-former
        self.video_frame_position_embedding = nn.Embedding(32, 768)
        vq_cfg = _bert_config(hidden_size=64, num_attention_heads=4,
                              intermediate_size=128, num_hidden_layers=2,
                              encoder_width=768, add_cross_attention=True,
                              cross_attention_freq=1, query_length=8,
                              num_basis=16, sticky=True, sigmas=[0.005, 0.01],
                              tau=0.75, alpha=0.5)
        self.video_Qformer = Q.BertLMHeadModel(config=vq_cfg)
        self.video_Qformer.cls = None
        self.video_Qformer.bert.embeddings.word_embeddings = None
        self.video_Qformer.bert.embeddings.position_embeddings = None
        for layer in self.video_Qformer.bert.encoder.layer:
            layer.output = None
            layer.intermediate = None
        self.video_query_tokens = nn.Parameter(torch.zeros(1, 8, 64))
        self.video_query_tokens.data.normal_(std=0.02)
        self.llama_proj = nn.Linear(64, 96)
        _set_ltm_cpu(self.video_Qformer.bert.encoder)

    # infinityqa.py:251-278 minus the cuda/.half() casts
    def encode_short_memory_frame(self, videofragment):
        b, _, t, _, _ = videofragment.size()
        frames = videofragment.permute(0, 2, 1, 3, 4).reshape(b * t, 3, 28, 28)
        image_embeds = self.ln_vision(self.visual_encoder(frames))
        image_atts = torch.ones(image_embeds.size()[:-1], dtype=torch.long)
        query_tokens = self.query_tokens.expand(image_embeds.shape[0], -1, -1)
        query_output = self.Qformer.bert(
            query_embeds=query_tokens, position_embedding_ext=None,
            new_video=False, encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts, return_dict=True)
        return [f for f in query_output.last_hidden_state]  # per-frame [32, 768]

    # infinityqa.py:281-344
    def encode_video(self, short_memory_buffer, new_video):
        buffer = [f.unsqueeze(0) for f in short_memory_buffer]
        n_position = math.ceil(math.sqrt(len(buffer)))
        n_position = min(n_position, 32)
        position_ids = torch.arange(n_position).long().unsqueeze(0)
        p = self.video_frame_position_embedding(position_ids).squeeze(0)
        pos_alpha = 0.01
        u = [(p_i - pos_alpha * p[0]) / (1 - pos_alpha) for p_i in p]
        fpe = []
        for i in range(n_position):
            for j in range(n_position):
                fpe.append((pos_alpha * u[i] + (1 - pos_alpha) * u[j]).unsqueeze(0))
        fpe = torch.cat(fpe, dim=0)
        while len(buffer) > fpe.shape[0]:
            buffer.pop(0)
        cur_pos = torch.cat([fpe[i].unsqueeze(0) for i in range(len(buffer))], dim=0)
        cur_pos = cur_pos.unsqueeze(-2).unsqueeze(0)
        frame_hidden = torch.cat(buffer, dim=0)
        t = len(buffer)
        frame_hidden = frame_hidden.reshape(1, t, *frame_hidden.shape[1:])
        frame_hidden = frame_hidden.reshape(1, t * frame_hidden.shape[2], -1)
        frame_atts = torch.ones(frame_hidden.size()[:-1], dtype=torch.long)
        video_query_tokens = self.video_query_tokens.expand(frame_hidden.shape[0], -1, -1)
        frame_pos = cur_pos.reshape(1, -1, cur_pos.shape[-1])
        out = self.video_Qformer.bert(
            position_embedding_ext=frame_pos, query_embeds=video_query_tokens,
            encoder_hidden_states=frame_hidden, encoder_attention_mask=frame_atts,
            new_video=new_video, return_dict=True)
        return self.llama_proj(out.last_hidden_state)


def gen_infvideollama(num_chunks=3, frames_per_chunk=4, seed=7):
    gen_golden_vit._stub_modules()  # timm + InfVideoLLaMA.common stubs
    Q = gen_golden_qformer.load_reference_qformer()
    eva = _load(os.path.join(REF_VL, "eva_vit.py"), "_ref_eva_pipeline")
    model = InfinityQATiny(Q, eva)
    model.eval()

    torch.manual_seed(seed)
    chunks = [torch.randn(1, 3, frames_per_chunk, 28, 28) * 0.5
              for _ in range(num_chunks)]

    ltm_mod = sys.modules["InfVideoLLaMA.models.long_term_attention_gibbs"]
    embs = []
    cwd = os.getcwd()
    with _DrawRecorder(ltm_mod) as rec, tempfile.TemporaryDirectory() as td:
        os.chdir(td)  # the LTM forward pickles a density dump to ./
        try:
            with torch.no_grad():
                for i, ch in enumerate(chunks):
                    buf = model.encode_short_memory_frame(ch)
                    emb = model.encode_video(buf, new_video=(i == 0))
                    embs.append(emb.numpy().copy())
        finally:
            os.chdir(cwd)
    mean_emb = np.mean(np.stack(embs), axis=0)

    n_cross = 2  # video Q-former: 2 layers, cross every layer
    assert len(rec.draws) == (num_chunks - 1) * n_cross, len(rec.draws)

    out = {"num_chunks": num_chunks, "frames_per_chunk": frames_per_chunk,
           "mean_emb": mean_emb}
    for i, ch in enumerate(chunks):
        out[f"pixels{i}"] = ch.numpy()
        out[f"emb{i}"] = embs[i]
    for i, d in enumerate(rec.draws):
        out[f"bins{i}"] = d  # chunk-major, then cross-layer order
    for k, v in model.state_dict().items():
        out["sd." + k] = v.numpy()
    path = os.path.join(OUT, "pipeline_infvideollama.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {num_chunks} chunks, emb {embs[0].shape}, "
          f"{len(rec.draws)} sticky draws")


# ---------------------------------------------------------------- case B ---


class VideoChat2Tiny(nn.Module):
    """Tiny-geometry replica of VideoChat2_it_mistral's encode side
    (videochat2_it_mistral.py:58-163): UMT ViT @1024 (LTM pools 196x1024),
    12->2-layer text-input Q-former @64, 8+4 query tokens, mistral_proj."""

    def __init__(self, Qv, vit):
        super().__init__()
        torch.manual_seed(23)
        self.vision_encoder = vit.PretrainVisionTransformer(
            img_size=224, patch_size=16, encoder_embed_dim=1024,
            encoder_depth=2, encoder_num_heads=4, mlp_ratio=1.0, qkv_bias=True,
            num_frames=2, tubelet_size=1, ckpt_num_frame=2, with_ln=True,
            return_index=-1)
        self.vision_layernorm = nn.LayerNorm(1024, eps=1e-12)  # blip2/blip2.py:88
        qcfg = _bert_config(hidden_size=64, num_attention_heads=4,
                            intermediate_size=128, num_hidden_layers=2,
                            vocab_size=512, encoder_width=1024,
                            add_cross_attention=True, cross_attention_freq=2,
                            query_length=8, num_basis=16, sticky=True,
                            sigmas=[0.005, 0.01], tau=0.75, alpha=0.5)
        self.qformer = Qv.BertLMHeadModel(config=qcfg)
        self.qformer.cls = None
        self.query_tokens = nn.Parameter(torch.zeros(1, 8, 64))
        self.query_tokens.data.normal_(std=0.02)
        self.extra_query_tokens = nn.Parameter(torch.zeros(1, 4, 64))
        self.extra_query_tokens.data.normal_(std=0.02)
        self.mistral_proj = nn.Linear(64, 96)
        _set_ltm_cpu(self.qformer.bert.encoder)

    # videochat2_it_mistral.py:181-253 minus the cuda/autocast casts and with
    # pre-tokenized instruction ids
    def encode_img(self, image, input_ids, attn_mask, new_video):
        image = image.permute(0, 2, 1, 3, 4)  # [B,T,C,H,W] -> [B,C,T,H,W]
        image_embeds = self.vision_encoder(image, use_image=False)
        B, T, L, C = image_embeds.shape
        image_embeds = image_embeds.reshape(B, -1, C)
        image_embeds = self.vision_layernorm(image_embeds)
        image_atts = torch.ones(image_embeds.size()[:-1], dtype=torch.long)
        query_tokens = torch.cat([self.query_tokens, self.extra_query_tokens], dim=1)
        query_tokens = query_tokens.expand(image_embeds.shape[0], -1, -1)
        query_atts = torch.ones(query_tokens.size()[:-1], dtype=torch.long)
        qformer_atts = torch.cat([query_atts, attn_mask], dim=1)
        query_output = self.qformer.bert(
            input_ids, attention_mask=qformer_atts, query_embeds=query_tokens,
            encoder_hidden_states=image_embeds, encoder_attention_mask=image_atts,
            return_dict=True, new_video=new_video)
        return self.mistral_proj(
            query_output.last_hidden_state[:, :query_tokens.size(1), :])


def gen_videochat2(num_chunks=3, frames_per_chunk=2, seed=13):
    gen_golden_vit._stub_modules()
    Qv = load_vc2_qformer()
    vit = _load(os.path.join(REF_VC2, "vit.py"), "_ref_umt_pipeline")
    model = VideoChat2Tiny(Qv, vit)
    model.eval()

    torch.manual_seed(seed)
    chunks = [torch.randn(1, frames_per_chunk, 3, 224, 224) * 0.5
              for _ in range(num_chunks)]
    input_ids = torch.randint(0, 512, (1, 6))
    attn_mask = torch.ones(1, 6, dtype=torch.long)

    ltm_mod = sys.modules["_vc2blip.long_term_attention_gibbs"]
    embs = []
    cwd = os.getcwd()
    with _DrawRecorder(ltm_mod) as rec, tempfile.TemporaryDirectory() as td:
        os.chdir(td)
        try:
            with torch.no_grad():
                for i, ch in enumerate(chunks):
                    emb = model.encode_img(ch, input_ids, attn_mask,
                                           new_video=(i == 0))
                    embs.append(emb.numpy().copy())
        finally:
            os.chdir(cwd)
    mean_emb = np.mean(np.stack(embs), axis=0)

    n_cross = 1  # 2 layers, cross_attention_freq=2 -> layer 0 only
    assert len(rec.draws) == (num_chunks - 1) * n_cross, len(rec.draws)

    out = {"num_chunks": num_chunks, "frames_per_chunk": frames_per_chunk,
           "input_ids": input_ids.numpy(), "attn_mask": attn_mask.numpy(),
           "mean_emb": mean_emb}
    for i, ch in enumerate(chunks):
        out[f"pixels{i}"] = ch.numpy()
        out[f"emb{i}"] = embs[i]
    for i, d in enumerate(rec.draws):
        out[f"bins{i}"] = d
    for k, v in model.state_dict().items():
        out["sd." + k] = v.numpy()
    path = os.path.join(OUT, "pipeline_videochat2.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {num_chunks} chunks, emb {embs[0].shape}, "
          f"{len(rec.draws)} sticky draws")


def main():
    os.makedirs(OUT, exist_ok=True)
    gen_infvideollama()
    gen_videochat2()


if __name__ == "__main__":
    main()
