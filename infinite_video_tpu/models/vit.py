"""Vision transformers: EVA-CLIP ViT-g/14 and UMT ViT-L/16, one implementation.

Covers the reference's two encoders with a shared block:
  - EVA-CLIP ViT-g/14 (infty-Video-LLaMA/InfVideoLLaMA/models/eva_vit.py:388-423):
    patch 14, d=1408, depth 39, 16 heads, mlp 4.3637, cls token, learned abs
    pos-embed, q/v-only qkv bias, no final LN (BLIP-2 applies an fp32 LN outside).
  - UMT ViT-L/16 (infty-VideoChat2/models/blip2/vit.py:244-440): patch 16,
    d=1024, depth 24 (+return_index truncation), 16 heads, no cls token,
    fixed sinusoid space-time pos-embed, optional final LN, tubelet 1.

TPU-native choices: NHWC image layout, bf16-friendly compute dtype with fp32
LayerNorms, patch embedding expressed as a reshaped matmul (MXU) rather than
a conv, `jax.checkpoint`-compatible plain-function blocks.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ViTConfig", "VisionTransformer", "eva_vit_g_config", "umt_vit_l_config",
           "sinusoid_table", "interpolated_sinusoid_table"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_hidden: int = 6144            # int(embed_dim * mlp_ratio)
    use_cls_token: bool = True
    pos_embed: str = "learned"        # "learned" | "sinusoid"
    num_frames: int = 1               # >1 ⇒ video model (UMT, joint space-time attn)
    ckpt_num_frame: int = -1          # pretrained table frame count (UMT: 4)
    final_ln: bool = False
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    # GELU flavor: "erf" (torch nn.GELU default — the reference), "tanh",
    # or "auto" = tanh when compute dtype is not fp32. Measured on v5e
    # (tools/profile_vit.py): exact erf costs 0.94 ms/frame of EVA-g's
    # 5.12 (18%) while tanh times identically to relu; the erf-vs-tanh
    # delta (≲3e-3 abs) is below bf16 rounding, so bf16 serving uses tanh
    # and fp32 parity/golden paths keep erf.
    gelu: str = "auto"
    # Attention implementation: "auto" (Pallas whole-row kernel on TPU where
    # the geometry fits VMEM, flash kernel for long joint space-time
    # sequences, XLA einsums elsewhere), "xla", "pallas"/"pallas_direct"
    # (ops/pallas/vit_attention.py whole-row kernels), or "flash"
    # (ops/pallas/flash_attention.py, causal=False — the S=3136 16-frame UMT
    # geometry where the whole-row [S,S] scores exceed VMEM).
    # Measured on v5e (tools/ab_vit_attention.py, round-5 A/Bs in
    # docs/KERNELS.md §5b/§5c): "auto" routes fits_vmem geometries to the
    # layer-fused kernel (qkv GEMM + attention in one Pallas call — full
    # EVA-g forward 28.9-29.0 ms vs 33.7 XLA, +16%, wins every paired run);
    # the out-projection fold beyond it was measured SLOWER (-5.7%, §5c)
    # and stays an explicit impl only. S>VMEM geometries (16-frame UMT,
    # S=3136) take the non-causal flash kernel, which wins its A/B by ~25%
    # of the whole forward (tools/ab_umt_attention.py, KERNELS.md §6).
    attn_impl: str = "auto"
    attn_interpret: bool = False      # test hook for the Pallas path

    def __post_init__(self):
        if self.attn_impl not in ("auto", "xla", "pallas", "pallas_direct",
                                  "pallas_packed", "pallas_layer",
                                  "pallas_layer_proj", "flash"):
            raise ValueError("ViTConfig.attn_impl must be 'auto', 'xla', "
                             "'pallas', 'pallas_direct', 'pallas_packed', "
                             "'pallas_layer', 'pallas_layer_proj' or "
                             f"'flash', got {self.attn_impl!r}")

    @property
    def gelu_approximate(self) -> bool:
        if self.gelu == "auto":
            return self.dtype != jnp.float32
        return self.gelu == "tanh"

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def tokens_per_frame(self) -> int:
        return self.grid * self.grid

    @property
    def num_tokens(self) -> int:
        return self.tokens_per_frame * self.num_frames + (1 if self.use_cls_token else 0)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def eva_vit_g_config(img_size: int = 224, dtype=jnp.float32) -> ViTConfig:
    """create_eva_vit_g (eva_vit.py:388-400): mlp_hidden = int(1408*4.3637) = 6144."""
    return ViTConfig(img_size=img_size, patch_size=14, embed_dim=1408, depth=39,
                     num_heads=16, mlp_hidden=int(1408 * 4.3637), use_cls_token=True,
                     pos_embed="learned", final_ln=False, dtype=dtype)


def umt_vit_l_config(img_size: int = 224, num_frames: int = 16, depth: int = 24,
                     ckpt_num_frame: int = 4, dtype=jnp.float32) -> ViTConfig:
    """build_vit defaults (vit.py:408-427, configs/config_mistral.json:15-29):
    ViT-L/16, d=1024, 16 heads, mlp 4096, return_index=-1 keeps all 24 blocks,
    pretrained with 4-frame sinusoid tables."""
    return ViTConfig(img_size=img_size, patch_size=16, embed_dim=1024, depth=depth,
                     num_heads=16, mlp_hidden=4096, use_cls_token=False,
                     pos_embed="sinusoid", num_frames=num_frames,
                     ckpt_num_frame=ckpt_num_frame, final_ln=True, dtype=dtype)


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """Classic sin/cos table [1, n_position, d_hid] (vit.py:163-176)."""
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    i = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2 * (i // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None].astype(np.float32)


def interpolated_sinusoid_table(n_position: int, d_hid: int, cur_frame: int,
                                ckpt_num_frame: int) -> np.ndarray:
    """Temporal interpolation of the pretrained table (vit.py:163-196).

    The UMT checkpoint was trained with `ckpt_num_frame` frames; for longer
    clips the reference builds the table at the checkpoint frame count and
    linearly interpolates along time. Mirrors get_sinusoid_encoding_table.
    """
    if ckpt_num_frame != -1 and cur_frame != ckpt_num_frame:
        spatial = n_position // cur_frame
        base = sinusoid_table(spatial * ckpt_num_frame, d_hid)      # [1, T0*S, d]
        t = base.reshape(1, ckpt_num_frame, spatial, d_hid)
        t = np.transpose(t, (0, 3, 1, 2))                           # [1, d, T0, S]
        # linear interpolation along time to cur_frame (torch F.interpolate,
        # mode='linear' on the flattened [1*d*S, T0] view per reference)
        x_new = np.linspace(0, ckpt_num_frame - 1, cur_frame)
        # torch linear interpolate uses align_corners=False semantics:
        scale = ckpt_num_frame / cur_frame
        x_new = np.maximum(0, np.minimum(ckpt_num_frame - 1,
                                         (np.arange(cur_frame) + 0.5) * scale - 0.5))
        lo = np.floor(x_new).astype(int)
        hi = np.minimum(lo + 1, ckpt_num_frame - 1)
        w = (x_new - lo)[None, None, :, None]
        out = t[:, :, lo, :] * (1 - w) + t[:, :, hi, :] * w         # [1, d, T, S]
        out = np.transpose(out, (0, 2, 3, 1)).reshape(1, n_position, d_hid)
        return out.astype(np.float32)
    return sinusoid_table(n_position, d_hid)


class _QKVKernel(nn.Module):
    """Parameter shim: declares a Dense-layout kernel [in, features] at the
    SAME param path as `nn.Dense(name="qkv")` so the fused layer kernel
    (impl="pallas_layer") shares checkpoints with every other impl."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (in_features, self.features))


class _DenseParams(nn.Module):
    """Parameter shim: declares kernel+bias at the SAME param path as
    `nn.Dense(name=...)` so fused kernels that consume the projection
    weights directly share checkpoints with every other impl."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (in_features, self.features)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class ViTAttention(nn.Module):
    """Fused-qkv attention with q/v-only bias (eva_vit.py:62-146, vit.py:57-101)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.embed_dim
        impl0 = cfg.attn_impl
        if impl0 == "auto":
            from infinite_video_tpu.ops.pallas.vit_attention import fits_vmem

            # layer-fused entry wherever the whole-row family applies: it
            # internally falls back packed -> qkv as VMEM budgets require,
            # so one route covers EVA-g (layer kernel, 275.6 f/s round-5
            # A/B) and UMT 4/8-frame (packed/qkv fallback, -41% vs XLA at
            # S=1568); S>VMEM geometries take the flash kernel below.
            if (jax.default_backend() == "tpu"
                    and fits_vmem(x.shape[1], cfg.head_dim, x.dtype)):
                impl0 = "pallas_layer"
        if impl0 == "pallas_layer_proj":
            # qkv GEMM + attention + out-projection in ONE kernel — neither
            # the qkv activations nor the packed attention output
            # round-trips HBM. Measured SLOWER than pallas_layer on EVA-g
            # (docs/KERNELS.md §5c: -5.7%; the fold costs per-batch-element
            # w_proj re-reads and evicts the residual-add from the proj
            # GEMM's XLA fusion), so "auto" never picks it; kept as an
            # explicit impl with the measurement on the record. Params are
            # declared at the nn.Dense "qkv"/"proj" paths, so checkpoints
            # interchange with every other impl.
            from infinite_video_tpu.ops.pallas.vit_attention import (
                vit_attention_layer_proj)

            w = _QKVKernel(3 * d, name="qkv")(x.shape[-1])
            q_bias = self.param("q_bias", nn.initializers.zeros, (d,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (d,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            w_p, b_p = _DenseParams(d, name="proj")(d)
            return vit_attention_layer_proj(
                x.astype(cfg.dtype), w.astype(cfg.dtype),
                bias.astype(jnp.float32), w_p.astype(cfg.dtype),
                b_p.astype(jnp.float32), heads=cfg.num_heads,
                sm_scale=cfg.head_dim ** -0.5,
                interpret=cfg.attn_interpret)
        if impl0 == "pallas_layer":
            # fused qkv-GEMM + attention in ONE kernel: the projection never
            # round-trips HBM and there is no custom-call boundary for XLA
            # to stall on (docs/KERNELS.md §5 post-packed attribution). The
            # kernel param is declared at the nn.Dense(name="qkv") path, so
            # checkpoints are interchangeable with the other impls.
            from infinite_video_tpu.ops.pallas.vit_attention import (
                vit_attention_layer)

            w = _QKVKernel(3 * d, name="qkv")(x.shape[-1])
            q_bias = self.param("q_bias", nn.initializers.zeros, (d,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (d,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            out = vit_attention_layer(x.astype(cfg.dtype),
                                      w.astype(cfg.dtype),
                                      bias.astype(jnp.float32),
                                      heads=cfg.num_heads,
                                      sm_scale=cfg.head_dim ** -0.5,
                                      interpret=cfg.attn_interpret)
            return nn.Dense(d, dtype=cfg.dtype, name="proj")(out)
        qkv = nn.Dense(3 * d, use_bias=False, dtype=cfg.dtype, name="qkv")(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (d,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (d,))
        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = qkv + bias.astype(qkv.dtype)

        b, s, _ = x.shape
        qkv = qkv.reshape(b, s, 3, cfg.num_heads, cfg.head_dim)
        impl = impl0
        if impl == "auto":
            # TPU + fits_vmem was already taken by the layer-fused route
            # above; what remains is the CPU/parity path and the long joint
            # space-time sequences (16-frame UMT, S=3136) whose whole-row
            # scores exceed VMEM — the non-causal flash kernel wins that
            # A/B vs the XLA einsums (tools/ab_umt_attention.py,
            # docs/KERNELS.md §6)
            impl = "flash" if jax.default_backend() == "tpu" else "xla"
        if impl == "flash":
            from infinite_video_tpu.ops.pallas.flash_attention import (
                flash_attention)

            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            out = flash_attention(q, k, v, causal=False,
                                  sm_scale=cfg.head_dim ** -0.5,
                                  interpret=cfg.attn_interpret)
            out = out.astype(cfg.dtype).reshape(b, s, d)
            return nn.Dense(d, dtype=cfg.dtype, name="proj")(out)
        if impl in ("pallas", "pallas_direct", "pallas_packed"):
            # fused entries: consume [b, s, 3, h, hd] directly — "pallas"
            # pays one layout op into the kernel; "pallas_direct" indexes
            # the projection tensor in place (one transpose out);
            # "pallas_packed" additionally writes straight into the
            # [b, s, h*hd] layout the proj Dense consumes — zero XLA layout
            # ops on either side (A/B in docs/KERNELS.md §4)
            from infinite_video_tpu.ops.pallas import vit_attention as vk

            fn = {"pallas": vk.vit_attention_qkv,
                  "pallas_direct": vk.vit_attention_qkv_direct,
                  "pallas_packed": vk.vit_attention_qkv_packed}[impl]
            out = fn(qkv, sm_scale=cfg.head_dim ** -0.5,
                     interpret=cfg.attn_interpret)
            return nn.Dense(d, dtype=cfg.dtype, name="proj")(out)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]      # [b, s, h, hd]
        q = q * (cfg.head_dim ** -0.5)
        # fp32 scores/softmax: measured free on v5e (tools/profile_vit.py —
        # the ViT is matmul-bound; the softmax ablation moves nothing)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, d)
        return nn.Dense(d, dtype=cfg.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-LN block; the ∞-Video configs never use layerscale (init_values=0)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm1")(x)
        x = x + ViTAttention(cfg, name="attn")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm2")(x)
        h = nn.Dense(cfg.mlp_hidden, dtype=cfg.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=cfg.gelu_approximate)
        h = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    """Shared EVA / UMT trunk.

    Input: [B, H, W, C] images (or [B, T, H, W, C] video for UMT); output:
    [B, tokens, embed_dim] (video: tokens = T * tokens_per_frame; the VC2
    wrapper reshapes to [B, T, L, C] itself, vit.py:399-406).
    """

    cfg: ViTConfig
    remat: bool = False

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if pixels.ndim == 5:
            # Video [B, T, H, W, C]: tokens of all frames form ONE sequence —
            # UMT runs joint space-time attention (vit.py:301-321).
            b, t = pixels.shape[:2]
            pixels = pixels.reshape((b * t,) + pixels.shape[2:])
        else:
            b, t = pixels.shape[0], 1

        # Patch embedding as a single matmul over p×p×C patch vectors
        # (equivalent to the reference's strided conv, MXU-friendly).
        p = cfg.patch_size
        bt, hgt, wid, c = pixels.shape
        g = hgt // p
        x = pixels.reshape(bt, g, p, g, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(bt, g * g, p * p * c).astype(cfg.dtype)
        x = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="patch_embed")(x)
        if t > 1:
            x = x.reshape(b, t * cfg.tokens_per_frame, cfg.embed_dim)

        if cfg.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim))
            x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (x.shape[0], 1, 1)), x],
                                axis=1)

        if cfg.pos_embed == "learned":
            pos = self.param("pos_embed", nn.initializers.zeros,
                             (1, cfg.tokens_per_frame + int(cfg.use_cls_token),
                              cfg.embed_dim))
            x = x + pos.astype(x.dtype)
        else:
            # Fixed sinusoid space-time table, temporally interpolated from the
            # checkpoint's frame count (vit.py:163-196,301-312).
            table = jnp.asarray(interpolated_sinusoid_table(
                t * cfg.tokens_per_frame, cfg.embed_dim, cur_frame=t,
                ckpt_num_frame=cfg.ckpt_num_frame))
            x = x + table.astype(x.dtype)

        block = ViTBlock
        if self.remat:
            block = nn.remat(ViTBlock)
        for i in range(cfg.depth):
            x = block(cfg, name=f"block_{i}")(x)

        if cfg.final_ln:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm")(x)
        return x
