"""Stage-1 pretraining losses: video-text contrastive / matching / MLM.

Ports of infty-VideoChat2/models/criterions.py:15-446 in functional JAX:
  - `get_sim`: pairwise video↔text similarity with frame aggregation
    (mean/max) over normalized projections (criterions.py:15-54)
  - `vtc_loss`: in-batch contrastive with soft targets from shared indices
    (criterions.py:57-101); the reference's grad-propagating GatherLayer
    all_gather (utils/distributed.py:111-161) becomes `jax.lax.all_gather`
    inside shard_map/pjit — differentiable by construction — via `axis_name`
  - `vtm_hard_negative_indices` + `vtm_loss`: matching with similarity-
    weighted hard negative mining (criterions.py:103-180)
  - `mlm_loss`: masked-LM cross entropy over the Q-former text stream
  - `mac_loss` family: mask-align-clip distillation between student and
    CLIP-teacher representations (criterions.py:337-446)

All losses are pure functions usable inside jit; sampling of hard negatives
takes an explicit PRNG key.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["get_sim", "vtc_loss", "vtm_hard_negative_indices", "vtm_loss",
           "mlm_loss", "mask_tokens", "cap_loss", "mac_loss",
           "mac_vision_loss", "mac_all_loss"]


def _normalize(x, axis=-1):
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def get_sim(vision_proj: jnp.ndarray, text_proj: jnp.ndarray, temp: float = 1.0,
            agg: str = "mean") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vision [B,T,C] (or [B,C]), text [B,C] -> (sim_v2t [B,B], sim_t2v [B,B])."""
    v = _normalize(vision_proj)
    t = _normalize(text_proj)
    if v.ndim == 3:
        sim = jnp.einsum("mld,nd->mln", v, t) / temp
        sim_v2t = sim.mean(1) if agg == "mean" else sim.max(1)
        sim_t2v = sim_v2t.T
    else:
        sim_v2t = v @ t.T / temp
        sim_t2v = sim_v2t.T
    return sim_v2t, sim_t2v


def _soft_targets(sim: jnp.ndarray, idx: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Positive mask (samples sharing an index are all positives), normalized."""
    b = sim.shape[0]
    if idx is None:
        mask = jnp.eye(b)
    else:
        mask = (idx[:, None] == idx[None, :]).astype(jnp.float32)
    return mask / mask.sum(1, keepdims=True)


def vtc_loss(vision_proj, text_proj, idx=None, temp: float = 1.0,
             agg: str = "mean", axis_name: Optional[str] = None) -> jnp.ndarray:
    """Video-text contrastive loss; with `axis_name`, representations are
    all-gathered across the data-parallel axis first (≡ GatherLayer)."""
    if axis_name is not None:
        gather = lambda x: jax.lax.all_gather(x, axis_name).reshape(
            (-1,) + x.shape[1:])
        vision_proj = gather(vision_proj)
        text_proj = gather(text_proj)
        if idx is not None:
            idx = gather(idx)
    sim_v2t, sim_t2v = get_sim(vision_proj, text_proj, temp, agg)
    targets = jax.lax.stop_gradient(_soft_targets(sim_v2t, idx))
    loss_v2t = -(jax.nn.log_softmax(sim_v2t, axis=1) * targets).sum(1).mean()
    loss_t2v = -(jax.nn.log_softmax(sim_t2v, axis=1) * targets).sum(1).mean()
    return (loss_v2t + loss_t2v) / 2.0


def vtm_hard_negative_indices(key, sim_v2t, sim_t2v, idx=None,
                              hard_neg: bool = True):
    """Similarity-weighted negative sampling (criterions.py:130-160).

    Returns (neg_text_idx_for_each_video, neg_video_idx_for_each_text)."""
    b = sim_v2t.shape[0]
    if idx is None:
        pos = jnp.eye(b, dtype=bool)
    else:
        pos = idx[:, None] == idx[None, :]
    k1, k2 = jax.random.split(key)
    if hard_neg:
        w_v2t = jnp.where(pos, -jnp.inf, sim_v2t)
        w_t2v = jnp.where(pos, -jnp.inf, sim_t2v)
        neg_text = jax.random.categorical(k1, w_v2t, axis=1)
        neg_video = jax.random.categorical(k2, w_t2v, axis=1)
    else:
        logits = jnp.where(pos, -jnp.inf, jnp.zeros_like(sim_v2t))
        neg_text = jax.random.categorical(k1, logits, axis=1)
        neg_video = jax.random.categorical(k2, logits, axis=1)
    return neg_text, neg_video


def vtm_loss(match_fn: Callable, vtm_head_fn: Callable, key,
             vision_embeds, text_ids, text_atts, vision_proj, text_proj,
             idx=None, temp: float = 1.0, hard_neg: bool = True) -> jnp.ndarray:
    """Video-text matching loss over [pos; neg-text; neg-video] triplets.

    match_fn(vision_embeds, text_ids, text_atts) -> multimodal cls embedding;
    vtm_head_fn(cls) -> 2-class logits (match / no-match).
    """
    b = vision_proj.shape[0]
    sim_v2t, sim_t2v = get_sim(vision_proj[:, None] if vision_proj.ndim == 2
                               else vision_proj, text_proj, temp)
    neg_text, neg_video = vtm_hard_negative_indices(
        key, jax.lax.stop_gradient(sim_v2t), jax.lax.stop_gradient(sim_t2v),
        idx, hard_neg)

    pos_cls = match_fn(vision_embeds, text_ids, text_atts)
    neg_t_cls = match_fn(vision_embeds, text_ids[neg_text], text_atts[neg_text])
    neg_v_cls = match_fn(vision_embeds[neg_video], text_ids, text_atts)
    logits = vtm_head_fn(jnp.concatenate([pos_cls, neg_t_cls, neg_v_cls], 0))
    labels = jnp.concatenate([jnp.ones(b, jnp.int32),
                              jnp.zeros(2 * b, jnp.int32)])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def mask_tokens(key, input_ids, vocab_size: int, mask_token_id: int,
                mlm_prob: float = 0.15, special_mask=None):
    """BERT-style masking: 15% positions, 80% [MASK] / 10% random / 10% keep.
    Returns (masked_ids, labels with -100 on unmasked)."""
    k1, k2, k3 = jax.random.split(key, 3)
    prob = jax.random.uniform(k1, input_ids.shape)
    maskable = jnp.ones(input_ids.shape, bool) if special_mask is None \
        else ~special_mask
    masked = (prob < mlm_prob) & maskable
    labels = jnp.where(masked, input_ids, -100)

    decide = jax.random.uniform(k2, input_ids.shape)
    random_ids = jax.random.randint(k3, input_ids.shape, 0, vocab_size)
    out = jnp.where(masked & (decide < 0.8), mask_token_id, input_ids)
    out = jnp.where(masked & (decide >= 0.8) & (decide < 0.9), random_ids, out)
    return out, labels


def mlm_loss(logits, labels) -> jnp.ndarray:
    mask = (labels != -100).astype(jnp.float32)
    safe = jnp.where(labels == -100, 0, labels)
    ll = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    return (ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def cap_loss(logits, text_labels, label_smoothing: float = 0.1) -> jnp.ndarray:
    """Caption LM loss over the Q-former text stream in causal mode
    (videochat2_qformer.py:343-371): shifted next-token cross entropy with
    -100 masking AND label_smoothing=0.1 — the reference's BertLMHeadModel
    hard-codes it (Qformer.py:1130-1140; torch semantics: target = (1-eps)·
    one-hot + eps/K uniform, mean over non-ignored positions). `logits`
    cover the text positions only."""
    shift_logits = logits[:, :-1]
    shift_labels = text_labels[:, 1:]
    mask = (shift_labels != -100).astype(jnp.float32)
    safe = jnp.where(shift_labels == -100, 0, shift_labels)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(axis=-1)
    per_tok = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return (per_tok * mask).sum() / jnp.maximum(mask.sum(), 1.0)


# --------------------------------------------------------------------------
# MAC (mask align clip) distillation — criterions.py:337-446. Student
# features are aligned to a frozen CLIP teacher; 'l2' loss on normalized
# vectors is 2-2·cosine, 'mse'/'smooth_l1' are elementwise regressions.


def _mac_elementwise(student, teacher, loss_type: str):
    if loss_type == "l2":
        return (2.0 - 2.0 * (student * teacher).sum(-1)).mean()
    if loss_type == "mse":
        return jnp.square(student - teacher).mean()
    if loss_type == "smooth_l1":
        d = jnp.abs(student - teacher)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5).mean()
    raise NotImplementedError(loss_type)


def _mac_norm(x, norm_type: str):
    if norm_type == "l2":
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    if norm_type == "none":
        return x
    raise NotImplementedError(norm_type)


def mac_loss(student_output, clip_output, norm_type: str = "l2",
             loss_type: str = "l2") -> jnp.ndarray:
    """Token-level distillation, shapes [K, B, N, C] (criterions.py:352-377)."""
    return _mac_elementwise(_mac_norm(student_output, norm_type),
                            _mac_norm(clip_output, norm_type), loss_type)


def _mac_align_time(student_v, clip_v):
    # unequal temporal lengths collapse to clip-level means (criterions.py:389)
    if student_v.shape[1] != clip_v.shape[1]:
        student_v = student_v.mean(1, keepdims=True)
        clip_v = clip_v.mean(1, keepdims=True)
    return student_v, clip_v


def mac_vision_loss(student_v_output, clip_v_output, norm_type: str = "l2",
                    loss_type: str = "l2") -> jnp.ndarray:
    """Vision-only distillation, shapes [B, T, C] (criterions.py:379-407)."""
    s, c = _mac_align_time(student_v_output, clip_v_output)
    return _mac_elementwise(_mac_norm(s, norm_type), _mac_norm(c, norm_type),
                            loss_type)


def mac_all_loss(student_v_output, clip_v_output, student_t_output,
                 clip_t_output, norm_type: str = "l2",
                 loss_type: str = "l2") -> jnp.ndarray:
    """Joint vision+text distillation, mean of the two terms
    (criterions.py:409-446)."""
    s_v, c_v = _mac_align_time(student_v_output, clip_v_output)
    loss_v = _mac_elementwise(_mac_norm(s_v, norm_type),
                              _mac_norm(c_v, norm_type), loss_type)
    loss_t = _mac_elementwise(_mac_norm(student_t_output, norm_type),
                              _mac_norm(clip_t_output, norm_type), loss_type)
    return (loss_v + loss_t) / 2.0
