"""Phi decoder (microsoft/phi-2 family) — third LLM of ∞-VideoChat2.

The reference loads Phi via trust_remote_code
(infty-VideoChat2/models/videochat_phi/videochat2_it_phi.py:108-116). Phi
differs from LLaMA/Mistral enough to warrant its own module:
  - LayerNorm with bias (not RMSNorm); ONE shared pre-LN per block feeding
    attention and MLP in PARALLEL: x + attn(ln(x)) + mlp(ln(x))
  - q/k/v/dense projections with biases; partial rotary embedding (only the
    first `rotary_dim` channels of each head are rotated)
  - MLP fc1/fc2 with tanh-approximated GELU (gelu_new)
  - final LayerNorm; lm_head WITH bias

Shares `KVCache`/generation with models/decoder.py (same cache layout).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from infinite_video_tpu.models.decoder import KVCache

__all__ = ["PhiConfig", "PhiDecoder", "phi2_config", "tiny_phi_config"]


@dataclasses.dataclass(frozen=True)
class PhiConfig:
    vocab_size: int = 51200
    hidden_size: int = 2560
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 10240
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.4
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)


def phi2_config(dtype=jnp.bfloat16) -> PhiConfig:
    return PhiConfig(dtype=dtype)


def tiny_phi_config(**kw) -> PhiConfig:
    base = dict(vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=4, intermediate_size=128, dtype=jnp.float32)
    base.update(kw)
    return PhiConfig(**base)


def _partial_rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float,
                  rotary_dim: int) -> jnp.ndarray:
    """Rotate only the first rotary_dim channels (HF Phi convention)."""
    rot, rest = x[..., :rotary_dim], x[..., rotary_dim:]
    half = rotary_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2, jnp.float32)
                                / rotary_dim))
    ang = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], -1)[None, :, None, :]
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], -1)[None, :, None, :]
    rf = rot.astype(jnp.float32)
    x1, x2 = rf[..., :half], rf[..., half:]
    rotated = jnp.concatenate([-x2, x1], -1)
    out = rf * cos + rotated * sin
    return jnp.concatenate([out.astype(x.dtype), rest], axis=-1)


class PhiLayer(nn.Module):
    cfg: PhiConfig

    @nn.compact
    def __call__(self, x, positions, mask_bias, cache_k, cache_v, cache_pos):
        # cache_k/cache_v are this layer's [B, max_len, kv, hd] PLANES of
        # the per-layer KVCache tuples — independent carry leaves that XLA
        # aliases in place through the decode loop (same design as
        # models/decoder.py DecoderLayer).
        cfg = self.cfg
        h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="input_ln")(x)

        b, s, _ = y.shape
        q = nn.Dense(h * hd, dtype=cfg.dtype, name="q_proj")(y)
        k = nn.Dense(kv * hd, dtype=cfg.dtype, name="k_proj")(y)
        v = nn.Dense(kv * hd, dtype=cfg.dtype, name="v_proj")(y)
        q = _partial_rope(q.reshape(b, s, h, hd), positions, cfg.rope_theta,
                          cfg.rotary_dim)
        k = _partial_rope(k.reshape(b, s, kv, hd), positions, cfg.rope_theta,
                          cfg.rotary_dim)
        v = v.reshape(b, s, kv, hd)

        if cache_k is not None:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k.astype(cache_k.dtype), (0, cache_pos, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v.astype(cache_v.dtype), (0, cache_pos, 0, 0))
            k_all, v_all = cache_k, cache_v
        else:
            k_all, v_all = k, v
        # Grouped-query attention on the un-expanded kv buffer (rep == 1 is
        # plain MHA) — same no-repeat rule as models/decoder.py: never
        # materialize an h/kv-expanded copy of the cache.
        rep = h // kv
        qg = q.reshape(b, s, kv, rep, hd)
        scores = jnp.einsum("bqgrd,bkgd->bgrqk", qg.astype(jnp.float32),
                            k_all.astype(jnp.float32)) / (hd ** 0.5)
        probs = jax.nn.softmax(scores + mask_bias[:, :, None], axis=-1)
        ctx = jnp.einsum("bgrqk,bkgd->bqgrd", probs.astype(v_all.dtype), v_all)
        attn_out = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="dense")(
            ctx.reshape(b, s, h * hd).astype(cfg.dtype))

        # Parallel MLP on the SAME layernorm output.
        m = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(y)
        m = jax.nn.gelu(m, approximate=True)
        m = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(m)

        return x + attn_out + m, cache_k, cache_v


class PhiDecoder(nn.Module):
    cfg: PhiConfig

    @nn.compact
    def __call__(self, input_ids=None, inputs_embeds=None, attention_mask=None,
                 cache: Optional[KVCache] = None, embed_only: bool = False):
        cfg = self.cfg
        embed = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                         name="embed_tokens")
        if embed_only:
            return embed(input_ids)
        if inputs_embeds is None:
            inputs_embeds = embed(input_ids)
        x = inputs_embeds.astype(cfg.dtype)
        b, s, _ = x.shape

        if cache is not None:
            positions = cache.pos + jnp.arange(s)
            key_pos = jnp.arange(cache.max_len)
        else:
            positions = jnp.arange(s)
            key_pos = jnp.arange(s)
        allowed = key_pos[None, :] <= positions[:, None]
        bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)[None, None]
        if attention_mask is not None:
            bias = bias + (1.0 - attention_mask[:, None, None, :]
                           .astype(jnp.float32)) * -1e9

        cp = cache.pos if cache is not None else None
        new_k, new_v = [], []
        for i in range(cfg.num_layers):
            ck = cache.k[i] if cache is not None else None
            cv = cache.v[i] if cache is not None else None
            x, ck, cv = PhiLayer(cfg, name=f"layer_{i}")(x, positions,
                                                         bias, ck, cv, cp)
            if cache is not None:
                new_k.append(ck)
                new_v.append(cv)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="final_ln")(x)
        logits = nn.Dense(cfg.vocab_size, dtype=cfg.dtype, name="lm_head")(
            x.astype(cfg.dtype)).astype(jnp.float32)
        if cache is not None:
            cache = KVCache(k=tuple(new_k), v=tuple(new_v), pos=cache.pos + s)
        return logits, cache
