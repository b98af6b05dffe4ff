"""Causal LLM decoder: LLaMA/Vicuna-7B and Mistral-7B, one implementation.

Replaces the reference's two vendored 755-line HF copies
(infty-Video-LLaMA/InfVideoLLaMA/models/modeling_llama.py, byte-identical copy
in infty-VideoChat2/models/blip2/) and the flash-attn variant
(modeling_llama_mem.py). Differences between the families are config:
  - llama/vicuna-7b : 32 layers, d=4096, 32 heads, no GQA, theta=1e4
  - mistral-7b      : 32 layers, d=4096, 32 q / 8 kv heads (GQA),
                      theta=1e6 (v0.2+), optional sliding window (v0.1)

TPU-native design:
  - KV cache is an explicit pytree of static-shape buffers written with
    dynamic_update_slice — decode steps jit once and never reshape.
  - Both prefill and decode take `inputs_embeds`, because the ∞-Video
    pipelines splice video query embeddings between text embeddings
    (conversation_video.py:153-188, videochat2_it_mistral.py:258-352).
  - bf16-friendly: params/activations in `dtype`, RMSNorm + RoPE + softmax
    in fp32.
  - Attention uses a Pallas flash kernel for long prefill when available
    (ops/pallas/flash_attention.py), XLA dot-attention otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

__all__ = ["DecoderConfig", "Decoder", "KVCache", "init_kv_cache",
           "llama7b_config", "mistral7b_config", "tiny_decoder_config"]


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 11008
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    sliding_window: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16
    # Pallas flash attention for full-sequence (no-cache, unpadded) forwards —
    # training and loss paths with long video+text contexts. Decode steps and
    # padded/windowed paths use the XLA einsum attention.
    use_flash: bool = False
    flash_interpret: bool = False  # test hook
    remat: bool = False            # rematerialize layers (training memory)
    # int8 weight-only projections (per-output-channel scales, fused dequant):
    # halves HBM footprint/decode bandwidth for single-chip 7B serving.
    quantized: bool = False
    # Pallas weight-streaming matmul for the int8 decode path (opt-in).
    # Measured on v5e (round 3 A/B, bench._decode_tok_s): XLA's fused
    # dequant-dot already runs the 7B decode at 90.9 tok/s b1 vs 89.6 for
    # the kernel — the decode is HBM-streaming-bound and XLA is at the
    # practical roofline, so the simpler path stays the default (same
    # honest-measurement verdict as ops/pallas/ltm_fused.py).
    quant_pallas: Optional[bool] = None
    # Serving layouts: fuse q/k/v into one projection (fused_proj) and
    # gate/up into one (fused_mlp) — fewer, larger HBM weight streams per
    # decode step. Param tree uses qkv_proj/gateup_proj; fuse an unfused
    # tree with models.quantized.fuse_decoder_params. Measured (v5e int8 7B,
    # bench._decode_tok_s A/B): both fused = 562 tok/s at batch 8 (vs 540)
    # but 76 vs 91 at batch 1 — XLA's dequant-dot degrades on the wide
    # fused gate/up (N=28672, same pathology as the 32000-vocab lm_head) —
    # so fuse for batched micro-batching serving, keep b1 unfused.
    # Single-chip serving only (TP sharding rules address unfused names).
    fused_proj: bool = False
    fused_mlp: bool = False
    # Weight-only quantization width: 8 = int8 per-output-channel scales,
    # 4 = int4 with per-(input-group, output-channel) scales (quant_group
    # inputs per scale). int4 halves the decode weight stream again
    # (~3.6 GB for a 7B) at a small accuracy cost — serving opt-in.
    quant_bits: int = 8
    quant_group: int = 128
    # int8 KV cache: entries quantize on write with one symmetric fp32 scale
    # per (batch, position, kv-head) row and dequantize at the attention
    # read. Halves KV HBM (a 32k-token Mistral-7B cache drops 4.2→2.2 GB
    # incl. scales) — that is the capacity lever for long-video chat
    # sessions and batched serving. Prefill on a fresh cache still attends
    # over the exact in-flight k/v (the flash path never reads the cache),
    # so only post-prefill decode sees quantization error (per-element
    # ≤ scale/2; see tests/test_kv_quant.py for the logit-drift bound).
    kv_quant: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def llama7b_config(dtype=jnp.bfloat16) -> DecoderConfig:
    """Vicuna-7B / LLaMA-7B (modeling_llama.py defaults)."""
    return DecoderConfig(dtype=dtype)


def mistral7b_config(dtype=jnp.bfloat16, rope_theta: float = 1e6,
                     sliding_window: Optional[int] = None) -> DecoderConfig:
    """Mistral-7B-Instruct (videochat2_it_mistral.py:114-147). v0.2+ has no
    sliding window and theta=1e6; pass sliding_window=4096, theta=1e4 for v0.1."""
    return DecoderConfig(vocab_size=32000, num_kv_heads=8, intermediate_size=14336,
                         rope_theta=rope_theta, rms_eps=1e-5,
                         sliding_window=sliding_window, dtype=dtype)


def tiny_decoder_config(**kw) -> DecoderConfig:
    """Debug-size decoder (mirrors the reference's tiny-Mistral debug mode,
    videochat2_it_mistral.py:121-129)."""
    base = dict(vocab_size=512, hidden_size=128, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=256, dtype=jnp.float32)
    base.update(kw)
    return DecoderConfig(**base)


@struct.dataclass
class KVCache:
    # Per-layer PLANES: tuples of [B, max_len, kv_heads, head_dim], one per
    # decoder layer. Each plane is its own jit/loop-carry leaf, so (a) XLA
    # provably aliases every plane in place through the decode loop
    # (donation and while-loop carry both work leaf-wise — a stacked
    # [L, ...] array with slice/update patterns kept two cache copies
    # alive, round-5 finding), and (b) no tensor ever approaches the
    # measured per-tensor 2^31-element compile ceiling of this backend
    # (docs/KERNELS.md §3d) — 32k-token batch-8 sessions are a plane of
    # 2^26 elements, not a stack of 2^32.
    k: Tuple[jnp.ndarray, ...]
    v: Tuple[jnp.ndarray, ...]
    pos: jnp.ndarray  # i32 scalar — number of filled positions
    # int8 mode only (DecoderConfig.kv_quant): per-row symmetric scales,
    # per-layer [B, max_len, kv_heads] fp32 planes. None for fp caches.
    k_scale: Optional[Tuple[jnp.ndarray, ...]] = None
    v_scale: Optional[Tuple[jnp.ndarray, ...]] = None

    @property
    def max_len(self) -> int:
        return self.k[0].shape[1]


def init_kv_cache(cfg: DecoderConfig, batch: int, max_len: int,
                  dtype=None) -> KVCache:
    n = cfg.num_layers
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    # getattr: duck-typed configs (models/phi.py) predate the kv_quant field
    if getattr(cfg, "kv_quant", False):
        sshape = shape[:-1]
        return KVCache(
            k=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
            v=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
            pos=jnp.zeros((), jnp.int32),
            k_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n)),
            v_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n)))
    dtype = dtype or cfg.dtype
    return KVCache(k=tuple(jnp.zeros(shape, dtype) for _ in range(n)),
                   v=tuple(jnp.zeros(shape, dtype) for _ in range(n)),
                   pos=jnp.zeros((), jnp.int32))


def _kv_quantize(x: jnp.ndarray):
    """[B, S, KV, D] -> (int8 rows, fp32 per-row scales [B, S, KV])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def _kv_dequantize(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale[..., None]


def _rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * w.astype(jnp.float32)).astype(x.dtype)


class QuantDense(nn.Module):
    """y = x · dequant(W): weights stream as int8 with per-output-channel
    fp32 scales; dequant fuses into the matmul (the int8 stays in HBM).

    Decode steps (few token rows) route through the Pallas weight-streaming
    kernel (ops/pallas/quant_matmul.py) on TPU — ~roofline HBM bandwidth on
    the int8 tiles; prefill/training fall back to the XLA fused dequant-dot
    (compute-bound there, XLA tiles it well)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    pallas: Optional[bool] = None   # None = auto (TPU + <=32 rows)
    interpret: bool = False         # test hook for the Pallas path
    bits: int = 8                   # 8 | 4 (see DecoderConfig.quant_bits)
    group: int = 128                # int4: inputs per scale group

    @nn.compact
    def __call__(self, x):
        k = x.shape[-1]
        if self.bits == 4:
            # int4 stored as two nibbles per int8 byte, half-split along the
            # input dim (models/quantized.py packing): native s4 arrays
            # cannot cross the axon relay's jit-argument boundary, and
            # packed-int8 carries identical HBM traffic. The Pallas kernel
            # unpacks in-register — packed bytes are the only HBM reads; an
            # XLA-level unpack materializes the dequantized matrix
            # (measured 5.7 tok/s vs ~91 int8 on the 7B) and exists only as
            # the non-TPU correctness fallback.
            g = min(self.group, k)
            n_groups = -(-k // g)
            in2 = (k + 1) // 2
            wq = self.param("kernel_q", nn.initializers.zeros,
                            (in2, self.features), jnp.int8)
            scale = self.param("scale", nn.initializers.ones,
                               (n_groups, self.features), jnp.float32)
            kernel_ok = k % 2 == 0 and in2 % g == 0
            if kernel_ok and (jax.default_backend() == "tpu"
                              or self.interpret):
                from infinite_video_tpu.ops.pallas.quant_matmul import (
                    quant_matmul_int4)

                rows = 1
                for s in x.shape[:-1]:
                    rows *= s
                y = quant_matmul_int4(x.reshape(rows, k), wq, scale,
                                      group=g, out_dtype=self.dtype,
                                      interpret=self.interpret)
                return y.reshape(*x.shape[:-1], self.features)
            low = jnp.right_shift(jnp.left_shift(wq, 4), 4)   # sign-extended
            high = jnp.right_shift(wq, 4)
            w4 = jnp.concatenate([low, high], axis=0)[:k]
            # per-input-group scales can't fold into the output (they sit
            # inside the K reduction): expand along K
            sexp = jnp.repeat(scale.astype(self.dtype), g, axis=0)[:k]
            w = w4.astype(self.dtype) * sexp
            return jnp.dot(x.astype(self.dtype), w)
        wq = self.param("kernel_q", nn.initializers.zeros,
                        (k, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        use_kernel = bool(self.pallas)   # opt-in; see DecoderConfig.quant_pallas
        if use_kernel:
            from infinite_video_tpu.ops.pallas.quant_matmul import (
                auto_blocks, quant_matmul)

            blocks = auto_blocks(k, self.features)
            if blocks is None and self.pallas is None:
                pass  # auto mode: XLA wins this shape (wide-vocab head)
            else:
                bk, bn = blocks or (512, 1024)
                y = quant_matmul(x.reshape(rows, k), wq, scale,
                                 block_k=bk, block_n=bn,
                                 out_dtype=self.dtype,
                                 interpret=self.interpret)
                return y.reshape(*x.shape[:-1], self.features)
        w = wq.astype(self.dtype) * scale.astype(self.dtype)
        return jnp.dot(x.astype(self.dtype), w)


def _dense_cls(cfg):
    """Projection factory: fp Dense or int8 QuantDense per config."""
    import functools

    if cfg.quantized:
        return functools.partial(QuantDense, dtype=cfg.dtype,
                                 pallas=cfg.quant_pallas,
                                 interpret=cfg.flash_interpret,
                                 bits=cfg.quant_bits, group=cfg.quant_group)
    import flax.linen as _nn

    return functools.partial(_nn.Dense, use_bias=False, dtype=cfg.dtype)


class RMSNorm(nn.Module):
    eps: float

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        return _rms_norm(x, w, self.eps)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """HF-convention rotary embedding. x: [B, S, H, D]; positions: [S] or
    [B, S] (per-row offsets for left-padded batched generation)."""
    d = x.shape[-1]
    if positions.ndim == 1:
        positions = positions[None, :]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq     # [B?, S, D/2]
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)  # [B?, S, D]
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = xf * cos[:, :, None, :] + rotated * sin[:, :, None, :]
    return out.astype(x.dtype)


class DecoderLayer(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                      # [B, S, D]
        positions: jnp.ndarray,              # [S]
        mask_bias: jnp.ndarray,              # [1|B, 1, S, K] additive fp32
        cache_k: Optional[jnp.ndarray],      # this layer's PLANE
        cache_v: Optional[jnp.ndarray],      #   [B, max_len, kv, hd] | None
        cache_pos: Optional[jnp.ndarray],
        cache_k_scale: Optional[jnp.ndarray] = None,  # [B, max_len, kv]
        cache_v_scale: Optional[jnp.ndarray] = None,
    ):
        # Each layer owns ONE cache plane (a KVCache tuple element), updated
        # with dynamic_update_slice and returned — the plane is an
        # independent jit/loop-carry leaf, so XLA aliases it in place
        # through the decode loop. An earlier stacked-[L, ...] design
        # (slice out per-layer arrays, jnp.stack back) defeated that
        # aliasing: buffer assignment kept TWO copies of the whole cache
        # alive per step (measured round 5: 8k b1 lanes at ~55-70% of the
        # weight-stream roofline, and the 8k batch-8 int8 lane failed
        # compile at 7.2 GB weights + 2x4.4 GB cache).
        cfg = self.cfg
        h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        dense = _dense_cls(cfg)
        res = x
        y = RMSNorm(cfg.rms_eps, name="input_ln")(x)
        if cfg.fused_proj:
            qkv = dense((h + 2 * kv) * hd, name="qkv_proj")(y)
            q, k, v = jnp.split(qkv, [h * hd, (h + kv) * hd], axis=-1)
        else:
            q = dense(h * hd, name="q_proj")(y)
            k = dense(kv * hd, name="k_proj")(y)
            v = dense(kv * hd, name="v_proj")(y)
        b, s, _ = y.shape
        q = _rope(q.reshape(b, s, h, hd), positions, cfg.rope_theta)
        k = _rope(k.reshape(b, s, kv, hd), positions, cfg.rope_theta)
        v = v.reshape(b, s, kv, hd)

        quant_read = False
        k_rowscale = v_rowscale = None
        if cache_k is not None and cache_k.dtype == jnp.int8:
            # int8 KV cache (cfg.kv_quant): quantize the new rows on write.
            # At the read the int8 buffers feed the score/value dots directly
            # (int8 -> compute-dtype casts are exact for |x| <= 127) and the
            # per-(b, pos, kv-head) scales fold into the einsums below — no
            # dequantized fp copy of the cache is ever materialized, so the
            # HBM/VMEM working set stays at the int8 footprint.
            kq, ks = _kv_quantize(k)
            vq, vs = _kv_quantize(v)
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, kq, (0, cache_pos, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, vq, (0, cache_pos, 0, 0))
            cache_k_scale = jax.lax.dynamic_update_slice(
                cache_k_scale, ks, (0, cache_pos, 0))
            cache_v_scale = jax.lax.dynamic_update_slice(
                cache_v_scale, vs, (0, cache_pos, 0))
            if mask_bias is None:
                # fresh-cache flash prefill never reads the buffer — the
                # in-flight k/v stay exact (see KVCache note).
                k_att, v_att = k, v
            else:
                k_att, v_att = cache_k, cache_v
                k_rowscale = cache_k_scale
                v_rowscale = cache_v_scale
                quant_read = True
        elif cache_k is not None:
            # Write the new keys/values at cache_pos, attend over the buffer.
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k.astype(cache_k.dtype), (0, cache_pos, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v.astype(cache_v.dtype), (0, cache_pos, 0, 0))
            if mask_bias is None:
                # flash prefill on a FRESH cache: there are no valid entries
                # before cache_pos, so attention reduces to causal
                # self-attention over the in-flight tokens — the flash kernel
                # applies and the (max_len-wide) buffer is never scanned.
                k_att, v_att = k, v
            else:
                k_att, v_att = cache_k, cache_v
        else:
            k_att, v_att = k, v

        # GQA: grouped-query attention against the UN-expanded kv buffer.
        # q reshapes to [B, S, kv, rep, hd] and the einsums carry the group
        # axis; rep == 1 degenerates to plain MHA, so one path serves both.
        # Never jnp.repeat the cached [B, max_len, kv, hd] buffer to h heads:
        # at 8k context x batch 8 that gather materialized a 4x-expanded
        # per-layer transient (plus its bf16 cast) — the allocation that
        # OOM'd the round-4 8k b8 lanes (mem-efficiency intent of the
        # reference's modeling_llama_mem.py:12-753).
        rep = h // kv

        if mask_bias is None:
            # causal path via the Pallas flash kernel. The kernel takes
            # matched head counts; the repeat here touches only the
            # in-flight rows ([B, S, kv, hd], S = prefill length), never a
            # max_len cache buffer.
            from infinite_video_tpu.ops.pallas.flash_attention import flash_attention

            if rep != 1:
                k_att = jnp.repeat(k_att, rep, axis=2)
                v_att = jnp.repeat(v_att, rep, axis=2)
            ctx = flash_attention(q, k_att, v_att, causal=True,
                                  interpret=cfg.flash_interpret)
            ctx = ctx.astype(v_att.dtype).reshape(b, s, h * hd)
        elif quant_read:
            # Scale-folded int8 attention: score_k = (q . k_int8) * ks_k and
            # ctx = (probs * vs)_k . v_int8 — mathematically identical to
            # dequantize-then-dot (the scale is constant along the head_dim
            # reduction), but the dots consume the int8 rows directly.
            dt = jnp.float32 if cfg.dtype == jnp.float32 else jnp.bfloat16
            qg = q.reshape(b, s, kv, rep, hd)
            ks_t = k_rowscale.transpose(0, 2, 1)[:, :, None, None, :]  # [B,kv,1,1,K]
            vs_t = v_rowscale.transpose(0, 2, 1)[:, :, None, None, :]
            scores = jnp.einsum("bqgrd,bkgd->bgrqk", qg.astype(dt),
                                k_att.astype(dt),
                                preferred_element_type=jnp.float32)
            scores = scores * ks_t / (hd ** 0.5) + mask_bias[:, :, None]
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bgrqk,bkgd->bqgrd", (probs * vs_t).astype(dt),
                             v_att.astype(dt),
                             preferred_element_type=jnp.float32)
            ctx = ctx.reshape(b, s, h * hd)
        else:
            qg = q.reshape(b, s, kv, rep, hd)
            scores = jnp.einsum("bqgrd,bkgd->bgrqk", qg.astype(jnp.float32),
                                k_att.astype(jnp.float32)) / (hd ** 0.5)
            scores = scores + mask_bias[:, :, None]
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bgrqk,bkgd->bqgrd", probs.astype(v_att.dtype),
                             v_att)
            ctx = ctx.reshape(b, s, h * hd)
        attn_out = dense(cfg.hidden_size, name="o_proj")(ctx.astype(cfg.dtype))
        x = res + attn_out

        res = x
        y = RMSNorm(cfg.rms_eps, name="post_ln")(x)
        if cfg.fused_mlp:
            gu = dense(2 * cfg.intermediate_size, name="gateup_proj")(y)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = dense(cfg.intermediate_size, name="gate_proj")(y)
            up = dense(cfg.intermediate_size, name="up_proj")(y)
        y = dense(cfg.hidden_size, name="down_proj")(jax.nn.silu(gate) * up)
        return res + y, cache_k, cache_v, cache_k_scale, cache_v_scale


class Decoder(nn.Module):
    """Embedding + decoder stack + final norm + LM head.

    Modes:
      - `__call__(input_ids=...)` or `(inputs_embeds=...)` without cache:
        full-sequence causal forward (training / loss).
      - with `cache`: writes S new positions starting at cache.pos, attends
        over the cache buffer, returns updated cache — covers both prefill
        (S = prompt length) and decode (S = 1).
    """

    cfg: DecoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,       # [B, S]
        inputs_embeds: Optional[jnp.ndarray] = None,   # [B, S, D]
        attention_mask: Optional[jnp.ndarray] = None,  # [B, S_total] 0/1
        cache: Optional[KVCache] = None,
        embed_only: bool = False,
        position_offset: Optional[jnp.ndarray] = None,  # [B] (left padding)
        position_ids: Optional[jnp.ndarray] = None,     # [B, S] RoPE positions
    ):
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
        # RoPE phases may shift per row (left padding) or be fully custom
        # (HF semantics: position_ids = cumsum(attention_mask)-1, so
        # mid-sequence pads don't advance positions); the causal bias below
        # always works over absolute buffer slots — padded keys are excluded
        # via attention_mask.
        rope_positions = positions
        if position_ids is not None:
            rope_positions = position_ids
        elif position_offset is not None:
            rope_positions = jnp.maximum(
                positions[None, :] - position_offset[:, None], 0)
        # Flash applies to full-sequence forwards AND to multi-token prefill
        # on a fresh cache (attention_mask=None is the caller's assertion
        # that no earlier cache entries exist and no padding needs masking —
        # runtime/generation.py passes it for unpadded prompts).
        if (cfg.use_flash and attention_mask is None and s > 1
                and position_offset is None and position_ids is None
                and cfg.sliding_window is None):
            bias = None  # causal handled inside the flash kernel
        else:
            # allowed(q, k) = causal, intersected with the sliding window.
            allowed = key_pos[None, :] <= positions[:, None]
            if cfg.sliding_window is not None:
                allowed &= key_pos[None, :] > positions[:, None] - cfg.sliding_window
            bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)[None, None]
            if attention_mask is not None:
                pad = 1.0 - attention_mask[:, None, None, :].astype(jnp.float32)
                bias = bias + pad * -1e9

        layer_cls = nn.remat(DecoderLayer) if (cfg.remat and cache is None) \
            else DecoderLayer
        quant_kv = cache is not None and cache.k_scale is not None
        # per-layer cache PLANES (KVCache tuples): each layer's plane flows
        # input -> dynamic_update_slice -> output as its own carry leaf, so
        # the decode loop updates the cache strictly in place (see KVCache)
        cp = cache.pos if cache is not None else None
        new_k, new_v, new_ks, new_vs = [], [], [], []
        for i in range(cfg.num_layers):
            ck = cache.k[i] if cache is not None else None
            cv = cache.v[i] if cache is not None else None
            cks = cache.k_scale[i] if quant_kv else None
            cvs = cache.v_scale[i] if quant_kv else None
            x, ck, cv, cks, cvs = layer_cls(cfg, name=f"layer_{i}")(
                x, rope_positions, bias, ck, cv, cp, cks, cvs)
            if cache is not None:
                new_k.append(ck)
                new_v.append(cv)
                new_ks.append(cks)
                new_vs.append(cvs)

        x = RMSNorm(cfg.rms_eps, name="final_ln")(x)
        logits = _dense_cls(cfg)(cfg.vocab_size, name="lm_head")(x)
        logits = logits.astype(jnp.float32)

        if cache is not None:
            cache = KVCache(k=tuple(new_k), v=tuple(new_v),
                            pos=cache.pos + s,
                            k_scale=tuple(new_ks) if quant_kv else None,
                            v_scale=tuple(new_vs) if quant_kv else None)
        return logits, cache
