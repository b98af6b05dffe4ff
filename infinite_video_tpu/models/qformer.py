"""BLIP-2 Q-former with LTM-augmented cross-attention — one implementation.

The reference carries three near-identical 1.2k-line copies of this file
(infty-Video-LLaMA/InfVideoLLaMA/models/Qformer.py,
infty-VideoChat2/models/blip2/Qformer.py, Qformer_baseline.py); this module is
the single parameterised equivalent. Differences are config:

  - ∞-Video-LLaMA frame Q-former : 12 layers, freq=2, LTM off     (blip2.py:48-66)
  - ∞-Video-LLaMA video Q-former : 2 layers, freq=1, LTM on       (infinityqa.py:37-55)
  - ∞-VideoChat2 Q-former        : 12 layers, freq=2, LTM on,
                                   text input + extra query tokens (blip2/blip2.py:47-77)
  - baseline (--baseline flag)   : any of the above with ltm_on=False
                                   (Qformer_baseline.py)

Architecture mirrors LAVIS BERT (Qformer.py:115-624): self-attention over
[query; text], cross-attention from query tokens into the vision encoder
states every `cross_attention_freq` layers, and a query/text split
feed-forward. The LTM hook (Qformer.py:216-223,303-304) blends
α·discrete + (1−α)·stop_grad(LTM) inside each cross-attention; the LTM shares
the discrete cross-attention's key/value projections (Qformer.py:156-157).

TPU-native differences from the reference (behaviour-preserving):
  - LTM memory is an explicit per-layer `LTMState` tuple passed in and
    returned, instead of mutable module attributes + a `new_video` flag.
  - Static shapes; masks are additive fp32 biases.
  - Discrete path can run in bf16 (`dtype`); LTM math is always fp32.

Not implemented (unused by any ∞-Video path): relative position embeddings
(Qformer.py:244-279), head pruning, head_mask.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from infinite_video_tpu.ops import ltm as ltm_ops

__all__ = ["QFormerConfig", "QFormer", "QFormerLMHead", "init_ltm_states"]


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    encoder_width: int = 1408          # vision feature width for cross-attn
    cross_attention_freq: int = 2      # cross-attn on layers i % freq == 0
    query_length: int = 32
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    initializer_range: float = 0.02
    # LTM blend: context = alpha*discrete + (1-alpha)*ltm (Qformer.py:303-304).
    # The reference skips the LTM entirely when alpha == 1.0 (Qformer.py:220).
    alpha: float = 0.75
    ltm: Optional[ltm_ops.LTMConfig] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def cross_layers(self) -> Tuple[int, ...]:
        return tuple(
            i for i in range(self.num_layers) if i % self.cross_attention_freq == 0
        )

    @property
    def ltm_active(self) -> bool:
        return self.ltm is not None and self.alpha != 1.0


def init_ltm_states(cfg: QFormerConfig, batch: int = 1):
    """Fresh LTM memory for every cross-attention layer (≡ new_video=True)."""
    if cfg.ltm is None:
        return ()
    return tuple(ltm_ops.init_state(cfg.ltm, batch) for _ in cfg.cross_layers)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, nh, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, nh * d)


class MultiHeadAttention(nn.Module):
    """BertSelfAttention + BertSelfOutput (Qformer.py:115-324).

    For cross-attention with an active LTM, the LTM consolidation/attention
    runs in fp32 through the *same* key/value Dense instances, and the blended
    context feeds the output projection.
    """

    cfg: QFormerConfig
    is_cross: bool

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,                # [B, S, H]
        kv_states: jnp.ndarray,                    # [B, S_kv, H|encoder_width]
        mask_bias: Optional[jnp.ndarray],          # [B, 1, S_q, S_kv] additive
        ltm_state: Optional[ltm_ops.LTMState] = None,
        ltm_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        sticky_bins: Optional[jnp.ndarray] = None,  # [B, S] replayed draws
    ):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim
        dt = cfg.dtype

        query = nn.Dense(cfg.hidden_size, dtype=dt, name="query")
        key = nn.Dense(cfg.hidden_size, dtype=dt, name="key")
        value = nn.Dense(cfg.hidden_size, dtype=dt, name="value")

        mixed_q = query(hidden_states)
        q = _split_heads(mixed_q, h)
        k = _split_heads(key(kv_states), h)
        v = _split_heads(value(kv_states), h)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
        if mask_bias is not None:
            scores = scores + mask_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
        ctx = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs, v))

        new_state = ltm_state
        if self.is_cross and ltm_state is not None and cfg.ltm_active:
            # Continuous LTM path (fp32), sharing this layer's key/value
            # projections (Qformer.py:156-157). Output is stop-gradient'd —
            # the memory is training-free (Qformer.py:221).
            lcfg = cfg.ltm
            x = ltm_ops.pool_frames(lcfg, kv_states.astype(jnp.float32))
            B = ltm_ops.consolidate(lcfg, ltm_state, x, ltm_rng,
                                    sticky_bins=sticky_bins)
            ltm_keys = key(B.astype(dt)).astype(jnp.float32)
            ltm_values = value(B.astype(dt)).astype(jnp.float32)
            ltm_ctx, mass = ltm_ops.continuous_attention(
                lcfg, mixed_q.astype(jnp.float32), ltm_keys, ltm_values
            )
            ltm_ctx = jax.lax.stop_gradient(ltm_ctx)
            ctx = cfg.alpha * ctx + (1.0 - cfg.alpha) * ltm_ctx.astype(ctx.dtype)
            new_state = ltm_ops.LTMState(B=B, sticky_mass=mass, step=ltm_state.step + 1)

        out = nn.Dense(cfg.hidden_size, dtype=dt, name="output_dense")(ctx)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt, name="output_ln")(
            out + hidden_states
        )
        return out, new_state


class FeedForward(nn.Module):
    """BertIntermediate + BertOutput (Qformer.py:389-416); exact (erf) GELU."""

    cfg: QFormerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        y = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="intermediate")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(y)
        y = nn.Dropout(cfg.hidden_dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln")(y + x)


class QFormerLayer(nn.Module):
    """BertLayer (Qformer.py:418-532): self-attn → (cross-attn on queries) →
    split feed-forward (query tokens use intermediate_query/output_query)."""

    cfg: QFormerConfig
    has_cross: bool

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        self_mask_bias: Optional[jnp.ndarray],
        encoder_hidden_states: Optional[jnp.ndarray],
        encoder_mask_bias: Optional[jnp.ndarray],
        query_length: int,
        ltm_state: Optional[ltm_ops.LTMState] = None,
        ltm_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        sticky_bins: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        attn_out, _ = MultiHeadAttention(cfg, is_cross=False, name="attention")(
            hidden_states, hidden_states, self_mask_bias,
            deterministic=deterministic,
        )

        new_state = ltm_state
        if query_length > 0:
            q_out = attn_out[:, :query_length]
            if self.has_cross and encoder_hidden_states is not None:
                q_out, new_state = MultiHeadAttention(
                    cfg, is_cross=True, name="crossattention"
                )(
                    q_out, encoder_hidden_states, encoder_mask_bias,
                    ltm_state=ltm_state, ltm_rng=ltm_rng,
                    deterministic=deterministic, sticky_bins=sticky_bins,
                )
            q_ff = FeedForward(cfg, name="ffn_query")(q_out, deterministic)
            if attn_out.shape[1] > query_length:
                t_ff = FeedForward(cfg, name="ffn")(
                    attn_out[:, query_length:], deterministic
                )
                out = jnp.concatenate([q_ff, t_ff], axis=1)
            else:
                out = q_ff
        else:
            out = FeedForward(cfg, name="ffn")(attn_out, deterministic)
        return out, new_state


class QFormer(nn.Module):
    """BertModel of the Q-former (Qformer.py:804-1026), LTM state threaded.

    Call with `query_embeds` (and optionally `input_ids` for the VC2
    instruction-aware mode); returns (last_hidden_state, new_ltm_states).
    Resetting the video memory (`new_video=True` in the reference) is done by
    passing `init_ltm_states(cfg, batch)`.
    """

    cfg: QFormerConfig

    @nn.compact
    def __call__(
        self,
        query_embeds: jnp.ndarray,                       # [B, Q, H]
        encoder_hidden_states: Optional[jnp.ndarray] = None,   # [B, S_enc, W]
        ltm_states: Sequence[ltm_ops.LTMState] = (),
        input_ids: Optional[jnp.ndarray] = None,         # [B, S_txt] int32
        attention_mask: Optional[jnp.ndarray] = None,    # [B, Q+S_txt] 0/1
        encoder_attention_mask: Optional[jnp.ndarray] = None,  # [B, S_enc] 0/1
        ltm_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        ltm_on: bool = True,
        causal_text: bool = False,
        sticky_bins: Sequence[Optional[jnp.ndarray]] = (),  # per cross layer
    ):
        cfg = self.cfg
        batch = query_embeds.shape[0]
        query_length = query_embeds.shape[1]

        # Embeddings (Qformer.py:55-112): queries pass through LayerNorm and
        # dropout together with any text embeddings.
        if input_ids is not None:
            tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                           name="word_embeddings")(input_ids)
            pos_ids = jnp.arange(input_ids.shape[1])[None, :]
            pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                           dtype=cfg.dtype, name="position_embeddings")(pos_ids)
            emb = jnp.concatenate([query_embeds.astype(cfg.dtype), tok + pos], axis=1)
        else:
            emb = query_embeds.astype(cfg.dtype)
        emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                           name="embeddings_ln")(emb)
        emb = nn.Dropout(cfg.hidden_dropout)(emb, deterministic=deterministic)

        seq_len = emb.shape[1]
        if attention_mask is None:
            attention_mask = jnp.ones((batch, seq_len), jnp.float32)
        self_bias = (1.0 - attention_mask[:, None, None, :]) * -10000.0
        if causal_text:
            # BLIP-2 LM mode (BertModel is_decoder with has_query,
            # Qformer.py:826-860): query rows attend to all queries; text rows
            # attend to every query token plus the causal text prefix.
            pos = jnp.arange(seq_len)
            is_text_col = pos >= query_length
            causal_ok = (~is_text_col[None, :]) | (pos[None, :] <= pos[:, None])
            self_bias = self_bias + jnp.where(causal_ok, 0.0, -10000.0)[None, None]

        enc_bias = None
        if encoder_hidden_states is not None:
            if encoder_attention_mask is None:
                encoder_attention_mask = jnp.ones(
                    encoder_hidden_states.shape[:2], jnp.float32
                )
            enc_bias = (1.0 - encoder_attention_mask[:, None, None, :]) * -10000.0

        use_ltm = ltm_on and cfg.ltm_active and len(ltm_states) > 0
        if use_ltm and ltm_rng is None:
            ltm_rng = jax.random.PRNGKey(0)

        hidden = emb
        new_states = []
        cross_idx = 0
        for i in range(cfg.num_layers):
            has_cross = i % cfg.cross_attention_freq == 0
            state = None
            rng_i = None
            bins_i = None
            if has_cross and use_ltm:
                state = ltm_states[cross_idx]
                rng_i = jax.random.fold_in(ltm_rng, i)
                if cross_idx < len(sticky_bins):
                    bins_i = sticky_bins[cross_idx]
            hidden, new_state = QFormerLayer(cfg, has_cross=has_cross,
                                             name=f"layer_{i}")(
                hidden, self_bias, encoder_hidden_states, enc_bias,
                query_length, ltm_state=state, ltm_rng=rng_i,
                deterministic=deterministic, sticky_bins=bins_i,
            )
            if has_cross:
                if use_ltm:
                    new_states.append(new_state)
                cross_idx += 1
        if not use_ltm:
            # Pass states through untouched so scan carries keep their
            # structure when the LTM is gated off (alpha == 1.0, baseline
            # mode, or ltm_on=False).
            return hidden, tuple(ltm_states)
        return hidden, tuple(new_states)


class QFormerLMHead(nn.Module):
    """BertOnlyMLMHead (cls.predictions): transform + decoder to vocab.

    Used by the stage-1 Q-former pretraining losses (MLM / LM); the video
    Q-formers null it out (infinityqa.py:115,204).
    """

    cfg: QFormerConfig

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="transform_dense")(hidden_states)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="transform_ln")(x)
        return nn.Dense(cfg.vocab_size, dtype=cfg.dtype, name="decoder")(x)
