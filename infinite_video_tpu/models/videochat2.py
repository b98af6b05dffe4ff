"""∞-VideoChat2: UMT ViT-L → LTM Q-former (instruction-aware) → Mistral-7B.

TPU-native rebuild of `VideoChat2_it_mistral`
(infty-VideoChat2/models/videochat_mistra/videochat2_it_mistral.py:15-353).
The single 12-layer BLIP-2 Q-former carries the LTM itself (cross-attention
every 2 layers ⇒ 6 LTM instances), takes 32 base + 64 extra query tokens and,
in `qformer_text_input` mode, the tokenized instruction alongside the queries
(encode_img: videochat2_it_mistral.py:181-253). Output queries are projected
to Mistral width; the eval protocol means per-chunk projections
(eval_code/run_nextqa_mistral.py:141-152).

Streaming state is the explicit per-layer `LTMState` tuple (≡ the reference's
`new_video` reset flag). The `baseline` flag of the reference is `ltm_on=False`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from infinite_video_tpu.models.decoder import DecoderConfig, mistral7b_config
from infinite_video_tpu.models.qformer import QFormer, QFormerConfig, init_ltm_states
from infinite_video_tpu.models.vit import ViTConfig, VisionTransformer, umt_vit_l_config
from infinite_video_tpu.ops.ltm import LTMConfig

__all__ = ["VideoChat2Config", "VideoChat2Encoder", "default_config", "tiny_config"]


@dataclasses.dataclass(frozen=True)
class VideoChat2Config:
    vit: ViTConfig
    qformer: QFormerConfig
    decoder: DecoderConfig
    num_query_token: int = 32
    extra_num_query_token: int = 64       # videochat2_it_mistral.py:92-96
    qformer_text_input: bool = True

    @property
    def total_query_tokens(self) -> int:
        return self.num_query_token + self.extra_num_query_token


def default_config(chunk_len: int = 16, num_basis: int = 64, tau: float = 0.75,
                   alpha: float = 1.0, sticky: bool = True, num_frames: int = 16,
                   dtype=jnp.bfloat16, fast_math: bool = False) -> VideoChat2Config:
    """README.md:60 NExT-QA recipe; model geometry configs/config_mistral.json.
    fast_math: bf16-MXU LTM serving mode (2.1x, ~6e-3 rel err; ops/ltm.py)."""
    ltm = LTMConfig(num_basis=num_basis, chunk_len=chunk_len,
                    tokens_per_frame=196, feature_dim=1024, hidden_size=768,
                    num_heads=12, tau=tau, sticky=sticky, fast_math=fast_math,
                    # XLA wins the fp32 integral chain under honest chain
                    # timing (docs/KERNELS.md) — keep the Pallas kernel opt-in.
                    use_pallas=False)
    return VideoChat2Config(
        vit=umt_vit_l_config(num_frames=num_frames, dtype=dtype),
        qformer=QFormerConfig(num_layers=12, cross_attention_freq=2,
                              encoder_width=1024, alpha=alpha, ltm=ltm,
                              dtype=jnp.float32),
        decoder=mistral7b_config(dtype=dtype),
    )


def vicuna_config(**kw) -> VideoChat2Config:
    """VC2 with Vicuna-7B (videochat_vicuna/*): same encoder stack, LLaMA
    decoder, vicuna '###' prompt dialect handled by data/runtime layers."""
    from infinite_video_tpu.models.decoder import llama7b_config

    cfg = default_config(**kw)
    return dataclasses.replace(cfg, decoder=llama7b_config(dtype=cfg.vit.dtype))


def phi_config(**kw):
    """VC2 with Phi-2 (videochat_phi/*). Returns (VideoChat2Config, PhiConfig):
    the Phi decoder lives in models/phi.py (different architecture family)."""
    from infinite_video_tpu.models.phi import phi2_config

    cfg = default_config(**kw)
    phi = phi2_config(dtype=cfg.vit.dtype)
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder,
                                         hidden_size=phi.hidden_size))
    return cfg, phi


def tiny_config(chunk_len: int = 2, num_basis: int = 16) -> VideoChat2Config:
    ltm = LTMConfig(num_basis=num_basis, chunk_len=chunk_len, tokens_per_frame=196,
                    feature_dim=48, hidden_size=64, num_heads=4, tau=0.75,
                    sticky=False)
    vit = ViTConfig(img_size=224, patch_size=16, embed_dim=48, depth=2, num_heads=4,
                    mlp_hidden=96, use_cls_token=False, pos_embed="sinusoid",
                    num_frames=chunk_len, ckpt_num_frame=4, final_ln=True)
    qf = QFormerConfig(hidden_size=64, num_layers=2, num_heads=4,
                       intermediate_size=128, encoder_width=48,
                       cross_attention_freq=2, query_length=12, vocab_size=128,
                       alpha=0.5, ltm=ltm)
    dec = DecoderConfig(vocab_size=128, hidden_size=96, num_layers=2, num_heads=4,
                        num_kv_heads=2, intermediate_size=192, dtype=jnp.float32)
    return VideoChat2Config(vit=vit, qformer=qf, decoder=dec, num_query_token=8,
                            extra_num_query_token=4)


class VideoChat2Encoder(nn.Module):
    """Vision side of ∞-VideoChat2: pixels (+instruction) → Mistral embeddings."""

    cfg: VideoChat2Config

    def setup(self):
        cfg = self.cfg
        self.vision_encoder = VisionTransformer(cfg.vit, name="vision_encoder")
        self.vision_layernorm = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                                             name="vision_layernorm")
        self.qformer = QFormer(cfg.qformer, name="qformer")
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, cfg.num_query_token, cfg.qformer.hidden_size))
        self.extra_query_tokens = self.param(
            "extra_query_tokens", nn.initializers.normal(0.02),
            (1, cfg.extra_num_query_token, cfg.qformer.hidden_size))
        self.mistral_proj = nn.Dense(cfg.decoder.hidden_size,
                                     dtype=cfg.qformer.dtype, name="mistral_proj")

    def __call__(
        self,
        pixels: jnp.ndarray,                      # [B, T, H, W, C]
        ltm_states: Tuple = (),
        instruction_ids: Optional[jnp.ndarray] = None,    # [B, S_txt]
        instruction_mask: Optional[jnp.ndarray] = None,   # [B, S_txt] 0/1
        ltm_rng: Optional[jax.Array] = None,
        ltm_on: bool = True,
        sticky_bins: Tuple = (),
    ):
        """One chunk step (encode_img, videochat2_it_mistral.py:181-253).

        Returns (mistral_embeds [B, total_query_tokens, llm_width], states).
        """
        feats = self.encode_frames(pixels)
        return self.encode_video_chunk(feats, ltm_states,
                                       instruction_ids=instruction_ids,
                                       instruction_mask=instruction_mask,
                                       ltm_rng=ltm_rng, ltm_on=ltm_on,
                                       sticky_bins=sticky_bins)

    def encode_frames(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """Stateless vision phase: [B, T, H, W, C] -> fp32 [B, T*L, C].

        Split out so streaming can batch the ViT over all chunks at once
        (runtime/streaming.py::stream_two_phase) — the ViT carries no
        cross-chunk state, only the Q-former's LTM does."""
        feats = self.vision_encoder(pixels)                   # [B, T*L, C]
        return self.vision_layernorm(feats.astype(jnp.float32))

    def encode_video_chunk(
        self,
        feats: jnp.ndarray,                       # [B, T*L, C] from encode_frames
        ltm_states: Tuple = (),
        instruction_ids: Optional[jnp.ndarray] = None,
        instruction_mask: Optional[jnp.ndarray] = None,
        ltm_rng: Optional[jax.Array] = None,
        ltm_on: bool = True,
        sticky_bins: Tuple = (),
    ):
        """Stateful phase: Q-former (+LTM) + projection."""
        b = feats.shape[0]
        q = jnp.concatenate([self.query_tokens, self.extra_query_tokens], axis=1)
        q = jnp.tile(q, (b, 1, 1))

        attention_mask = None
        if instruction_ids is not None:
            if instruction_mask is None:
                instruction_mask = jnp.ones(instruction_ids.shape, jnp.float32)
            query_mask = jnp.ones((b, q.shape[1]), jnp.float32)
            attention_mask = jnp.concatenate(
                [query_mask, instruction_mask.astype(jnp.float32)], axis=1)

        hidden, new_states = self.qformer(
            query_embeds=q, encoder_hidden_states=feats, ltm_states=ltm_states,
            input_ids=instruction_ids, attention_mask=attention_mask,
            ltm_rng=ltm_rng, ltm_on=ltm_on, sticky_bins=sticky_bins)
        out = self.mistral_proj(hidden[:, : q.shape[1]])
        return out, new_states

    def encode_hd(
        self,
        tiles: jnp.ndarray,                       # [n_tiles, T, H, W, C]
        ltm_states: Tuple = (),
        instruction_ids: Optional[jnp.ndarray] = None,
        instruction_mask: Optional[jnp.ndarray] = None,
        ltm_rng: Optional[jax.Array] = None,
        ltm_on: bool = True,
    ):
        """HD dynamic-resolution path (videochat2_it_hd_mistral.py:193-299).

        Each 224px tile (from data/hd_utils.py, optionally + a global
        thumbnail) is a separate batch element through the ViT and Q-former —
        per-tile LTM memories — and the per-tile query outputs are
        concatenated into one [1, n_tiles*Q, llm_width] sequence, exactly the
        reference's `qformer_features.view(1, -1, C)` assembly.
        """
        if instruction_ids is not None and instruction_ids.shape[0] == 1:
            instruction_ids = jnp.tile(instruction_ids, (tiles.shape[0], 1))
            if instruction_mask is not None:
                instruction_mask = jnp.tile(instruction_mask, (tiles.shape[0], 1))
        out, new_states = self(tiles, ltm_states,
                               instruction_ids=instruction_ids,
                               instruction_mask=instruction_mask,
                               ltm_rng=ltm_rng, ltm_on=ltm_on)
        nt, q, c = out.shape
        return out.reshape(1, nt * q, c), new_states

    def init_states(self, batch: int = 1):
        return init_ltm_states(self.cfg.qformer, batch)
