"""∞-Video-LLaMA: EVA ViT-g → frame Q-former → LTM video Q-former → Vicuna.

TPU-native rebuild of `InfinityQA`
(infty-Video-LLaMA/InfVideoLLaMA/models/infinityqa.py:26-540). The reference
streams chunks by mutating a python-list `short_memory_buffer` and threading a
`new_video` flag; here a chunk is encoded by pure functions and the only
cross-chunk state is the per-layer `LTMState` tuple, so unbounded videos scan
at constant HBM.

Pipeline per chunk (call stack SURVEY §3.1):
  1. `encode_frames`: EVA ViT (fp16/bf16, frozen) → fp32 LayerNorm →
     12-layer frame Q-former, 32 query tokens per frame  (infinityqa.py:251-278)
  2. `encode_video_chunk`: 2-layer video Q-former over the [T*32, 768] frame
     tokens with blended discrete+continuous cross-attention
     (infinityqa.py:280-337) → llama_proj to the LLM width (infinityqa.py:342)
  3. eval protocol: mean of per-chunk embeddings feeds the LLM
     (eval_code/eval/run_inference_inf_video_llama_nextqa.py:194)

The reference's compositional frame position embeddings (infinityqa.py:286-305)
are computed but used *only* as the LTM on/off gate in the Q-former
(Qformer.py:216) — they are never added to any hidden state — so they reduce
to the `ltm_on` flag here; the embedding table is kept for checkpoint parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from infinite_video_tpu.models.decoder import DecoderConfig, llama7b_config
from infinite_video_tpu.models.qformer import QFormer, QFormerConfig, init_ltm_states
from infinite_video_tpu.models.vit import ViTConfig, VisionTransformer, eva_vit_g_config
from infinite_video_tpu.ops.ltm import LTMConfig

__all__ = ["InfVideoLLaMAConfig", "InfVideoLLaMAEncoder", "default_config",
           "tiny_config"]


@dataclasses.dataclass(frozen=True)
class InfVideoLLaMAConfig:
    vit: ViTConfig
    frame_qformer: QFormerConfig
    video_qformer: QFormerConfig
    decoder: DecoderConfig
    num_query_token: int = 32
    num_video_query_token: int = 32
    max_frame_pos: int = 32

    @property
    def hidden(self) -> int:
        return self.frame_qformer.hidden_size


def default_config(chunk_len: int = 256, num_basis: int = 256, tau: float = 0.75,
                   alpha: float = 1.0, sticky: bool = True,
                   dtype=jnp.bfloat16, fast_math: bool = False) -> InfVideoLLaMAConfig:
    """README.md:39 NExT-QA recipe geometry; LTM params from infinityqa.py:37-55.
    fast_math: bf16-MXU LTM serving mode (2.1x, ~6e-3 rel err; ops/ltm.py)."""
    ltm = LTMConfig(num_basis=num_basis, chunk_len=chunk_len, tokens_per_frame=32,
                    feature_dim=768, hidden_size=768, num_heads=12, tau=tau,
                    sticky=sticky, fast_math=fast_math,
                    # XLA wins the fp32 integral chain under honest chain
                    # timing (docs/KERNELS.md) — keep the Pallas kernel opt-in.
                    use_pallas=False)
    return InfVideoLLaMAConfig(
        vit=eva_vit_g_config(dtype=dtype),
        # Frame-level Q-former: stock BLIP-2, LTM nulled (blip2.py:48-66).
        frame_qformer=QFormerConfig(num_layers=12, cross_attention_freq=2,
                                    encoder_width=1408, alpha=1.0, ltm=None,
                                    dtype=dtype),
        # Video Q-former: 2 layers, cross-attn every layer, LTM live
        # (infinityqa.py:37-55).
        video_qformer=QFormerConfig(num_layers=2, cross_attention_freq=1,
                                    encoder_width=768, alpha=alpha, ltm=ltm,
                                    dtype=jnp.float32),
        decoder=llama7b_config(dtype=dtype),
    )


def tiny_config(chunk_len: int = 4, num_basis: int = 16) -> InfVideoLLaMAConfig:
    """Small geometry for tests/dry-runs; same code paths as full size."""
    ltm = LTMConfig(num_basis=num_basis, chunk_len=chunk_len, tokens_per_frame=8,
                    feature_dim=64, hidden_size=64, num_heads=4, tau=0.75,
                    sticky=False)
    vit = ViTConfig(img_size=28, patch_size=14, embed_dim=48, depth=2, num_heads=4,
                    mlp_hidden=96, use_cls_token=True, pos_embed="learned")
    fq = QFormerConfig(hidden_size=64, num_layers=2, num_heads=4,
                       intermediate_size=128, encoder_width=48,
                       cross_attention_freq=2, query_length=8, alpha=1.0, ltm=None)
    vq = QFormerConfig(hidden_size=64, num_layers=2, num_heads=4,
                       intermediate_size=128, encoder_width=64,
                       cross_attention_freq=1, query_length=8, alpha=0.5, ltm=ltm)
    dec = DecoderConfig(vocab_size=128, hidden_size=96, num_layers=2, num_heads=4,
                        num_kv_heads=4, intermediate_size=192, dtype=jnp.float32)
    return InfVideoLLaMAConfig(vit=vit, frame_qformer=fq, video_qformer=vq,
                               decoder=dec, num_query_token=8,
                               num_video_query_token=8)


class InfVideoLLaMAEncoder(nn.Module):
    """Vision side of ∞-Video-LLaMA: everything up to the LLM embeddings.

    The LLM itself (`models.decoder.Decoder`) is a separate module so the
    7B decoder can live on its own sharding and generation loop.
    """

    cfg: InfVideoLLaMAConfig

    def setup(self):
        cfg = self.cfg
        self.vit = VisionTransformer(cfg.vit, name="visual_encoder")
        # blip2.py:76,105: fp32-forcing LayerNorm at torch's default eps=1e-5
        # (the VC2 side uses eps=1e-12 — blip2/blip2.py:88; they differ).
        self.ln_vision = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                      name="ln_vision")
        self.frame_qformer = QFormer(cfg.frame_qformer, name="Qformer")
        self.video_qformer = QFormer(cfg.video_qformer, name="video_Qformer")
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, cfg.num_query_token, cfg.frame_qformer.hidden_size))
        self.video_query_tokens = self.param(
            "video_query_tokens", nn.initializers.normal(0.02),
            (1, cfg.num_video_query_token, cfg.video_qformer.hidden_size))
        # Kept for checkpoint-shape parity; numerically unused (see module
        # doc). Width is the *frame* Q-former hidden (infinityqa.py:203).
        self.video_frame_position_embedding = self.param(
            "video_frame_position_embedding", nn.initializers.normal(0.02),
            (cfg.max_frame_pos, cfg.frame_qformer.hidden_size))
        self.llama_proj = nn.Dense(cfg.decoder.hidden_size,
                                   dtype=cfg.video_qformer.dtype, name="llama_proj")

    def encode_frames(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """[B, T, H, W, C] pixels -> [B, T*num_query_token, hidden] frame tokens.

        ViT + fp32 LN + frame Q-former with per-frame query tokens
        (infinityqa.py:251-278: frames are folded into the batch).
        """
        b, t = pixels.shape[:2]
        flat = pixels.reshape((b * t,) + pixels.shape[2:])
        feats = self.vit(flat)
        feats = self.ln_vision(feats.astype(jnp.float32))
        q = jnp.tile(self.query_tokens, (b * t, 1, 1))
        hidden, _ = self.frame_qformer(query_embeds=q, encoder_hidden_states=feats,
                                       ltm_on=False)
        return hidden.reshape(b, t * self.cfg.num_query_token, -1)

    def encode_video_chunk(
        self,
        frame_hidden: jnp.ndarray,          # [B, T*num_query_token, hidden]
        ltm_states: Tuple,
        ltm_rng: Optional[jax.Array] = None,
        ltm_on: bool = True,
        sticky_bins: Tuple = (),
    ):
        """One streaming step: video Q-former + projection to LLM width.

        Returns (llama_embeds [B, num_video_query_token, llm_width], states).
        `sticky_bins` (one [B, S] int array per cross layer) replays recorded
        sticky Categorical draws — parity-test hook (ops/ltm.py).
        """
        b = frame_hidden.shape[0]
        vq = jnp.tile(self.video_query_tokens, (b, 1, 1))
        hidden, new_states = self.video_qformer(
            query_embeds=vq, encoder_hidden_states=frame_hidden,
            ltm_states=ltm_states, ltm_rng=ltm_rng, ltm_on=ltm_on,
            sticky_bins=sticky_bins)
        return self.llama_proj(hidden), new_states

    def __call__(self, pixels: jnp.ndarray, ltm_states: Tuple,
                 ltm_rng: Optional[jax.Array] = None, ltm_on: bool = True,
                 sticky_bins: Tuple = ()):
        """Full chunk step: pixels -> LLM embeddings (+ updated LTM states)."""
        frame_hidden = self.encode_frames(pixels)
        return self.encode_video_chunk(frame_hidden, ltm_states, ltm_rng, ltm_on,
                                       sticky_bins)

    def init_states(self, batch: int = 1):
        return init_ltm_states(self.cfg.video_qformer, batch)
