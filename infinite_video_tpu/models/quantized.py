"""Int8 weight-only quantization for the decoder (serving memory/bandwidth).

A bf16 7B decoder is ~14 GB — at the edge of a single v5e's 16 GB HBM and
memory-bound at decode time. Weight-only int8 (per-output-channel symmetric
scales) halves both, with activations and accumulation kept in bf16/fp32.

`quantize_decoder_params` rewrites a Decoder param tree: every targeted 2-D
kernel becomes {kernel_q: int8 [in, out], scale: f32 [out]}. `QuantDecoder`
consumes that tree with the same architecture/config as `models.decoder.
Decoder` (same cache, generation loop, converters upstream). The embedding
and norms stay high-precision.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from infinite_video_tpu.models.decoder import (DecoderConfig, KVCache, RMSNorm,
                                               _rope)

__all__ = ["quantize_decoder_params", "QuantDecoder", "QUANT_TARGETS"]

QUANT_TARGETS = (r".*(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|"
                 r"down_proj|lm_head)/kernel$")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def quantize_decoder_params(params: Dict, targets: str = QUANT_TARGETS) -> Dict:
    """fp kernel [in, out] -> {kernel_q int8, scale f32[out]} on target paths."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: Dict = {}

    def put(path_parts, value):
        node = out
        for p in path_parts[:-1]:
            node = node.setdefault(p, {})
        node[path_parts[-1]] = value

    for path, leaf in flat:
        parts = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        p = "/".join(parts)
        if re.match(targets, p) and leaf.ndim == 2:
            w = np.asarray(leaf, np.float32)
            scale = np.abs(w).max(axis=0) / 127.0
            scale = np.maximum(scale, 1e-8)
            q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            put(parts[:-1] + ["kernel_q"], q)
            put(parts[:-1] + ["scale"], scale.astype(np.float32))
        else:
            put(parts, leaf)
    return out


class QuantDense(nn.Module):
    """y = x · dequant(W); weights stream as int8, dequant fuses into the
    matmul (XLA keeps the int8 in HBM and converts in-register)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        wq = self.param("kernel_q", nn.initializers.zeros,
                        (in_dim, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        w = wq.astype(self.dtype) * scale.astype(self.dtype)
        return jnp.dot(x.astype(self.dtype), w)


class QuantDecoderLayer(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, positions, mask_bias, cache_k, cache_v, cache_pos):
        cfg = self.cfg
        h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        res = x
        y = RMSNorm(cfg.rms_eps, name="input_ln")(x)
        q = QuantDense(h * hd, cfg.dtype, name="q_proj")(y)
        k = QuantDense(kv * hd, cfg.dtype, name="k_proj")(y)
        v = QuantDense(kv * hd, cfg.dtype, name="v_proj")(y)
        b, s, _ = y.shape
        q = _rope(q.reshape(b, s, h, hd), positions, cfg.rope_theta)
        k = _rope(k.reshape(b, s, kv, hd), positions, cfg.rope_theta)
        v = v.reshape(b, s, kv, hd)

        if cache_k is not None:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k.astype(cache_k.dtype), (0, cache_pos, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v.astype(cache_v.dtype), (0, cache_pos, 0, 0))
            k_all, v_all = cache_k, cache_v
        else:
            k_all, v_all = k, v
        if kv != h:
            k_all = jnp.repeat(k_all, h // kv, axis=2)
            v_all = jnp.repeat(v_all, h // kv, axis=2)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k_all.astype(jnp.float32)) / (hd ** 0.5)
        scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v_all.dtype), v_all)
        attn_out = QuantDense(cfg.hidden_size, cfg.dtype, name="o_proj")(
            ctx.reshape(b, s, h * hd).astype(cfg.dtype))
        x = res + attn_out

        res = x
        y = RMSNorm(cfg.rms_eps, name="post_ln")(x)
        gate = QuantDense(cfg.intermediate_size, cfg.dtype, name="gate_proj")(y)
        up = QuantDense(cfg.intermediate_size, cfg.dtype, name="up_proj")(y)
        y = QuantDense(cfg.hidden_size, cfg.dtype, name="down_proj")(
            jax.nn.silu(gate) * up)
        return res + y, cache_k, cache_v


class QuantDecoder(nn.Module):
    """Drop-in int8 variant of models.decoder.Decoder (same call signature)."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, input_ids=None, inputs_embeds=None, attention_mask=None,
                 cache: Optional[KVCache] = None, embed_only: bool = False,
                 position_offset: Optional[jnp.ndarray] = None):
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
            key_pos = jnp.arange(cache.k.shape[2])
        else:
            positions = jnp.arange(s)
            key_pos = jnp.arange(s)
        rope_positions = positions
        if position_offset is not None:
            rope_positions = jnp.maximum(
                positions[None, :] - position_offset[:, None], 0)
        allowed = key_pos[None, :] <= positions[:, None]
        if cfg.sliding_window is not None:
            allowed &= key_pos[None, :] > positions[:, None] - cfg.sliding_window
        bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)[None, None]
        if attention_mask is not None:
            bias = bias + (1.0 - attention_mask[:, None, None, :]
                           .astype(jnp.float32)) * -1e9

        new_k, new_v = [], []
        for i in range(cfg.num_layers):
            ck = cache.k[i] if cache is not None else None
            cv = cache.v[i] if cache is not None else None
            cp = cache.pos if cache is not None else None
            x, ck, cv = QuantDecoderLayer(cfg, name=f"layer_{i}")(
                x, rope_positions, bias, ck, cv, cp)
            if cache is not None:
                new_k.append(ck)
                new_v.append(cv)

        x = RMSNorm(cfg.rms_eps, name="final_ln")(x)
        logits = QuantDense(cfg.vocab_size, cfg.dtype, name="lm_head")(x)
        logits = logits.astype(jnp.float32)
        if cache is not None:
            cache = KVCache(k=jnp.stack(new_k), v=jnp.stack(new_v),
                            pos=cache.pos + s)
        return logits, cache
