"""Stage-1 Q-former contrastive pretraining model (VTC / VTM / MLM-cap).

Rebuild of `VideoChat2_qformer` (infty-VideoChat2/models/videochat2_qformer.py:
16-408): frozen UMT ViT → Q-former with query tokens → vision/text projection
heads into a shared embedding space, an ITM head over multimodal query
embeddings, a learnable clamped contrastive temperature, and the three-loss
objective (criterions weighted by config.criterion.loss_weight). Text encoding
reuses the same Q-former in text-only mode (queries absent), matching the
BLIP-2 recipe the reference inherits via xbert.

Losses live in training/criterions.py; this module wires the encoders,
projections and heads into a single flax model whose `loss()` returns the
weighted dict for the stage-1 trainer (tasks/train_qformer.py analogue).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from infinite_video_tpu.models.qformer import QFormer, QFormerConfig, QFormerLMHead
from infinite_video_tpu.models.vit import ViTConfig, VisionTransformer
from infinite_video_tpu.training import criterions

__all__ = ["QFormerPretrainConfig", "VideoChat2QFormerPretrain",
           "default_pretrain_config", "tiny_pretrain_config"]


@dataclasses.dataclass(frozen=True)
class QFormerPretrainConfig:
    vit: ViTConfig
    qformer: QFormerConfig
    num_query_token: int = 32
    embed_dim: int = 256
    temp_init: float = 0.07
    agg_method: str = "mean"
    vtm_hard_neg: bool = True
    loss_vtc: float = 1.0
    loss_vtm: float = 1.0
    loss_mlm: float = 1.0
    loss_cap: float = 0.0             # reference stage-1 uses cap=1.0, mlm=0.0
    mlm_prob: float = 0.15
    mask_token_id: int = 103          # bert-base [MASK]
    bos_token_id: int = 30522         # the added "[DEC]" token (blip2.py:29)
    pad_token_id: int = 0


class VideoChat2QFormerPretrain(nn.Module):
    cfg: QFormerPretrainConfig

    def setup(self):
        cfg = self.cfg
        self.vision_encoder = VisionTransformer(cfg.vit, name="vision_encoder")
        # learnable per-frame temporal embedding + separate fp32 LN, applied
        # AFTER the temp add (videochat2_qformer.py:36-41,176-180 keeps these
        # outside the ViT in stage-1; checkpoint frame-count mismatches are
        # interpolated at load, convert/checkpoints.py)
        self.vision_temp_embed = self.param(
            "vision_temp_embed", nn.initializers.normal(0.02),
            (1, cfg.vit.num_frames, 1, cfg.vit.embed_dim))
        self.vision_layernorm = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                                             name="vision_layernorm")
        self.qformer = QFormer(cfg.qformer, name="qformer")
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, cfg.num_query_token, cfg.qformer.hidden_size))
        self.vision_proj = nn.Dense(cfg.embed_dim, name="vision_proj")
        self.text_proj = nn.Dense(cfg.embed_dim, name="text_proj")
        self.itm_head = nn.Dense(2, name="itm_head")
        self.lm_head = QFormerLMHead(cfg.qformer, name="lm_head")
        self.temp = self.param("temp", nn.initializers.constant(cfg.temp_init), ())

    def clamped_temp(self):
        # clip_contrastive_temperature (videochat2_qformer.py:230-232)
        return jnp.clip(self.temp, 0.001, 0.5)

    def encode_vision(self, pixels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B,T,H,W,C] -> (patch features [B, T*L, C], query embeds [B, Q, H]).

        Mirrors encode_vision (videochat2_qformer.py:163-183): ViT → + per-
        frame temporal embedding → flatten → vision LN."""
        feats = self.vision_encoder(pixels)
        b = feats.shape[0]
        t = self.cfg.vit.num_frames
        feats = feats.reshape(b, t, -1, feats.shape[-1])
        feats = feats + self.vision_temp_embed.astype(feats.dtype)
        feats = feats.reshape(b, t * feats.shape[2], feats.shape[-1])
        feats = self.vision_layernorm(feats)
        q = jnp.tile(self.query_tokens, (b, 1, 1))
        query_out, _ = self.qformer(query_embeds=q, encoder_hidden_states=feats,
                                    ltm_on=False)
        return feats, query_out[:, : self.cfg.num_query_token]

    def encode_text(self, text_ids: jnp.ndarray, text_mask: jnp.ndarray):
        """Text-only pass through the Q-former trunk; pooled = CLS position."""
        # query_length=0 path: plain BERT over the text stream.
        hidden, _ = self.qformer(
            query_embeds=jnp.zeros((text_ids.shape[0], 0,
                                    self.cfg.qformer.hidden_size)),
            input_ids=text_ids, attention_mask=text_mask, ltm_on=False)
        return hidden, hidden[:, 0]

    def vtm_embed(self, vision_feats, text_ids, text_mask):
        """Multimodal match embedding: queries attend to text + vision
        (videochat2_qformer.py:386-407)."""
        b = vision_feats.shape[0]
        q = jnp.tile(self.query_tokens, (b, 1, 1))
        query_mask = jnp.ones((b, q.shape[1]), jnp.float32)
        mask = jnp.concatenate([query_mask, text_mask.astype(jnp.float32)], 1)
        hidden, _ = self.qformer(query_embeds=q, encoder_hidden_states=vision_feats,
                                 input_ids=text_ids, attention_mask=mask,
                                 ltm_on=False)
        return hidden[:, : self.cfg.num_query_token].mean(axis=1)

    def __call__(self, pixels, text_ids, text_mask, idx=None,
                 rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        temp = self.clamped_temp()

        vision_feats, vision_query = self.encode_vision(pixels)
        _, pooled_text = self.encode_text(text_ids, text_mask)

        vision_p = self.vision_proj(vision_query)          # [B, Q, C]
        text_p = self.text_proj(pooled_text)               # [B, C]

        losses = {}
        if cfg.loss_vtc:
            losses["loss_vtc"] = cfg.loss_vtc * criterions.vtc_loss(
                vision_p, text_p, idx, temp, agg=cfg.agg_method)
        if cfg.loss_vtm:
            losses["loss_vtm"] = cfg.loss_vtm * criterions.vtm_loss(
                lambda v, ids, atts: self.vtm_embed(v, ids, atts),
                self.itm_head, rng, vision_feats, text_ids, text_mask,
                vision_p.mean(1), text_p, idx, temp, cfg.vtm_hard_neg)
        if cfg.loss_mlm:
            # Masked LM over the text stream with vision-conditioned queries
            # in context (the reference's MLMLoss through xbert; here the
            # Q-former trunk plays both roles).
            assert cfg.mask_token_id < cfg.qformer.vocab_size, \
                "mask_token_id outside the Q-former vocab"
            k_mask, _ = jax.random.split(jax.random.fold_in(rng, 1))
            masked_ids, labels = criterions.mask_tokens(
                k_mask, text_ids, cfg.qformer.vocab_size, cfg.mask_token_id,
                cfg.mlm_prob)
            b = vision_feats.shape[0]
            q = jnp.tile(self.query_tokens, (b, 1, 1))
            mask = jnp.concatenate(
                [jnp.ones((b, q.shape[1]), jnp.float32),
                 text_mask.astype(jnp.float32)], axis=1)
            hidden, _ = self.qformer(
                query_embeds=q, encoder_hidden_states=vision_feats,
                input_ids=masked_ids, attention_mask=mask, ltm_on=False)
            logits = self.lm_head(hidden[:, cfg.num_query_token:])
            losses["loss_mlm"] = cfg.loss_mlm * criterions.mlm_loss(logits, labels)
        if cfg.loss_cap:
            # Caption LM loss (videochat2_qformer.py:343-371): BOS-prefixed
            # text decoded causally over the vision-conditioned query prefix.
            # The reference feeds the vision pass's past_key_values; the joint
            # causal_text pass is equivalent because query rows never attend
            # to text (models/qformer.py mask), so their K/V equal the
            # vision-only pass's.
            assert cfg.bos_token_id < cfg.qformer.vocab_size, \
                "bos_token_id outside the Q-former vocab"
            cap_ids = text_ids.at[:, 0].set(cfg.bos_token_id)
            labels = jnp.where(cap_ids == cfg.pad_token_id, -100, cap_ids)
            b = vision_feats.shape[0]
            q = jnp.tile(self.query_tokens, (b, 1, 1))
            mask = jnp.concatenate(
                [jnp.ones((b, q.shape[1]), jnp.float32),
                 text_mask.astype(jnp.float32)], axis=1)
            hidden, _ = self.qformer(
                query_embeds=q, encoder_hidden_states=vision_feats,
                input_ids=cap_ids, attention_mask=mask, ltm_on=False,
                causal_text=True)
            logits = self.lm_head(hidden[:, cfg.num_query_token:])
            losses["loss_cap"] = cfg.loss_cap * criterions.cap_loss(logits, labels)
        losses["loss_total"] = sum(losses.values())
        return losses


def default_pretrain_config(num_frames: int = 4,
                            dtype=jnp.float32) -> QFormerPretrainConfig:
    """Reference stage-1 geometry (scripts/videochat_vicuna/config_7b_stage1.py):
    UMT-L with return_index=-2 (23 of 24 blocks kept, final LN), bert-base
    Q-former with cross-attn every other layer, 32 query tokens, 768-wide
    shared embedding space, loss weights vtc=1, vtm=1, cap=1, mlm=0."""
    from infinite_video_tpu.models.vit import umt_vit_l_config

    # return_index=-2 keeps 23 of 24 blocks; the final LN lives in the
    # wrapper AFTER the temporal embedding (vit_add_ln separated, :251-255)
    vit = dataclasses.replace(
        umt_vit_l_config(num_frames=num_frames, depth=23, dtype=dtype),
        final_ln=False)
    qf = QFormerConfig(hidden_size=768, num_layers=12, num_heads=12,
                       intermediate_size=3072, encoder_width=1024,
                       cross_attention_freq=2, query_length=32,
                       vocab_size=30523,  # bert-base + the added "[DEC]" bos
                       alpha=1.0, ltm=None, dtype=dtype)
    return QFormerPretrainConfig(
        vit=vit, qformer=qf, num_query_token=32, embed_dim=768,
        loss_vtc=1.0, loss_vtm=1.0, loss_mlm=0.0, loss_cap=1.0,
        mask_token_id=103, bos_token_id=30522)


def tiny_pretrain_config() -> QFormerPretrainConfig:
    """Random tiny geometry for integration tests (--tiny launcher mode)."""
    from infinite_video_tpu.models.vit import ViTConfig

    vit = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                    num_heads=2, mlp_hidden=64, use_cls_token=False,
                    pos_embed="sinusoid", num_frames=2, final_ln=False)
    qf = QFormerConfig(hidden_size=32, num_layers=2, num_heads=2,
                       intermediate_size=64, encoder_width=32,
                       cross_attention_freq=2, query_length=4, vocab_size=64,
                       alpha=1.0, ltm=None)
    return QFormerPretrainConfig(vit=vit, qformer=qf, num_query_token=4,
                                 embed_dim=16, loss_cap=1.0, loss_mlm=0.0,
                                 mask_token_id=62, bos_token_id=63)
