"""Ablate the EVA-g vision step on real hardware: where does the MFU go?

The e2e vision bench (bench.py _e2e_vision_fps) measures ~190 f/s on one
v5e ≈ 50% MFU (EVA-g ≈ 520 GFLOP/frame, 197 TF/s bf16 peak). This script
decomposes the gap with dependency-chain timing (see bench.py): each mode
times one jitted scan over a variant of the ViT/e2e step with one component
ablated, so (full - ablated) isolates that component's cost.

Run from the repo root on a TPU runtime: `python tools/profile_vit.py`.
Results recorded in docs/KERNELS.md.
"""

import os
import sys
import time
from functools import partial
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from infinite_video_tpu.models import vit as vit_mod
from infinite_video_tpu.models.vit import ViTConfig, VisionTransformer, eva_vit_g_config

CHUNK = 8  # frames per step (bench geometry)


def _dispatch_floor(n: int = 2) -> float:
    @partial(jax.jit, static_argnames="n")
    def nil(seed, n):
        return jnp.float32(seed) * 0

    float(nil(0, n))
    t0 = time.perf_counter()
    float(nil(1, n))
    return time.perf_counter() - t0


def timed(name, stream, n, frames_per_step, floor, flops_per_frame=None):
    float(stream(999, n))  # compile
    best = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        float(stream(1000 * n + t, n))
        best = min(best, time.perf_counter() - t0)
    per_frame = max(best - floor, 1e-9) / n / frames_per_step
    line = f"{name:26s} {per_frame*1e3:8.3f} ms/frame  {1.0/per_frame:7.1f} f/s"
    if flops_per_frame:
        line += f"  {flops_per_frame/per_frame/1e12:6.1f} TF/s"
    print(line, flush=True)
    return per_frame


class _NoEinsumAttention(nn.Module):
    """qkv + proj matmuls kept; the S x S attention einsums/softmax dropped."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d = cfg.embed_dim
        qkv = nn.Dense(3 * d, use_bias=False, dtype=cfg.dtype, name="qkv")(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (d,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (d,))
        qkv = qkv + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(qkv.dtype)
        b, s, _ = x.shape
        v = qkv.reshape(b, s, 3, d)[:, :, 2]
        return nn.Dense(d, dtype=cfg.dtype, name="proj")(v)


class _NoSoftmaxAttention(nn.Module):
    cfg: ViTConfig
    """Everything except the softmax (isolates the softmax cost)."""

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d = cfg.embed_dim
        qkv = nn.Dense(3 * d, use_bias=False, dtype=cfg.dtype, name="qkv")(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (d,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (d,))
        qkv = qkv + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(qkv.dtype)
        b, s, _ = x.shape
        qkv = qkv.reshape(b, s, 3, cfg.num_heads, cfg.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (cfg.head_dim ** -0.5), k)
        attn = attn * jnp.float32(1e-3).astype(attn.dtype)  # softmax stand-in
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, d)
        return nn.Dense(d, dtype=cfg.dtype, name="proj")(out)


class _F32SoftmaxAttention(nn.Module):
    cfg: ViTConfig
    """Scores + softmax in fp32 (accuracy-first variant, for the cost delta)."""

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d = cfg.embed_dim
        qkv = nn.Dense(3 * d, use_bias=False, dtype=cfg.dtype, name="qkv")(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (d,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (d,))
        qkv = qkv + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(qkv.dtype)
        b, s, _ = x.shape
        qkv = qkv.reshape(b, s, 3, cfg.num_heads, cfg.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (cfg.head_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, d)
        return nn.Dense(d, dtype=cfg.dtype, name="proj")(out)


def vit_stream(attention_cls=None, gelu=None, identity_ln=False, n=24):
    """Build a jitted scan over the EVA-g ViT with optional ablations.

    The executable for chain length `n` is compiled INSIDE the patch
    context — a retrace outside it would silently run the unpatched model
    (this bit round 3's first profile run; every ablation measured the
    full model)."""
    cfg = eva_vit_g_config(dtype=jnp.bfloat16)
    patches = []
    if attention_cls is not None:
        patches.append(mock.patch.object(vit_mod, "ViTAttention",
                                         attention_cls))
    if gelu is not None:
        patches.append(mock.patch.object(jax.nn, "gelu", gelu))
    if identity_ln:
        class _IdLN(nn.Module):
            epsilon: float = 1e-6
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x):
                return x

        patches.append(mock.patch.object(nn, "LayerNorm", _IdLN))

    model = VisionTransformer(cfg)
    with _ctx(patches):
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((CHUNK, 224, 224, 3), jnp.bfloat16))["params"])()

        @partial(jax.jit, static_argnames="n")
        def run(params, seed, n):
            def step(carry, _):
                key = carry
                key, kd = jax.random.split(key)
                pixels = jax.random.normal(kd, (CHUNK, 224, 224, 3),
                                           jnp.bfloat16) * 0.5
                out = model.apply({"params": params}, pixels)
                return key, out.astype(jnp.float32).sum()

            _, sums = jax.lax.scan(step, jax.random.PRNGKey(seed), None,
                                   length=n)
            return sums.sum()

        # trace/compile inside the patch context so ablations take effect —
        # at the TIMING chain length (a different static n would retrace
        # outside the context with the patches reverted)
        float(run(params, 0, n))
    return lambda seed, n_: run(params, seed, n_)


class _ctx:
    def __init__(self, patches):
        self.patches = patches

    def __enter__(self):
        for p in self.patches:
            p.__enter__()

    def __exit__(self, *a):
        for p in reversed(self.patches):
            p.__exit__(*a)


def matmul_roofline_stream():
    """Pure chain of the per-block matmul shapes x depth: the speed-of-light
    reference for the same FLOPs (no LN/softmax/gelu/residuals)."""
    cfg = eva_vit_g_config()
    m = CHUNK * 257
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    w_qkv = jax.random.normal(keys[0], (cfg.embed_dim, 3 * cfg.embed_dim), jnp.bfloat16) * 0.02
    w_proj = jax.random.normal(keys[1], (cfg.embed_dim, cfg.embed_dim), jnp.bfloat16) * 0.02
    w_fc1 = jax.random.normal(keys[2], (cfg.embed_dim, cfg.mlp_hidden), jnp.bfloat16) * 0.02
    w_fc2 = jax.random.normal(keys[3], (cfg.mlp_hidden, cfg.embed_dim), jnp.bfloat16) * 0.02

    @partial(jax.jit, static_argnames="n")
    def run(seed, n):
        def step(carry, _):
            key = carry
            key, kd = jax.random.split(key)
            x = jax.random.normal(kd, (m, cfg.embed_dim), jnp.bfloat16)
            for _ in range(cfg.depth):
                q = (x @ w_qkv)[:, : cfg.embed_dim]
                x = q @ w_proj
                h = x @ w_fc1
                x = h @ w_fc2
            return key, x.astype(jnp.float32).sum()

        _, sums = jax.lax.scan(step, jax.random.PRNGKey(seed), None, length=n)
        return sums.sum()

    return lambda seed, n: run(seed, n)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    floor = _dispatch_floor()
    print(f"dispatch+readback floor: {floor*1e3:.1f} ms", flush=True)

    cfg = eva_vit_g_config()
    s, d, mh = 257, cfg.embed_dim, cfg.mlp_hidden
    flops_block = 2 * (4 * s * d * d + 2 * s * d * mh + 2 * s * s * d)
    flops_frame = cfg.depth * flops_block + 2 * s * 588 * d
    print(f"EVA-g: {flops_frame/1e9:.0f} GFLOP/frame (S={s}, d={d}, "
          f"mlp={mh}, depth={cfg.depth})", flush=True)

    n = 24
    mm_flops = cfg.depth * 2 * (4 * s * d * d + 2 * s * d * mh)
    timed("matmuls-only roofline", matmul_roofline_stream(), n, CHUNK, floor,
          mm_flops)
    full = timed("vit full (bf16)", vit_stream(n=n), n, CHUNK, floor,
                 flops_frame)
    timed("vit no-attn-einsums",
          vit_stream(attention_cls=_NoEinsumAttention, n=n), n, CHUNK, floor)
    timed("vit no-softmax",
          vit_stream(attention_cls=_NoSoftmaxAttention, n=n), n, CHUNK, floor)
    timed("vit f32-softmax",
          vit_stream(attention_cls=_F32SoftmaxAttention, n=n), n, CHUNK,
          floor)
    timed("vit relu-for-gelu",
          vit_stream(gelu=lambda x, approximate=True: jax.nn.relu(x), n=n),
          n, CHUNK, floor)
    _orig_gelu = jax.nn.gelu
    timed("vit tanh-gelu",
          vit_stream(gelu=lambda x, approximate=False: _orig_gelu(
              x, approximate=True), n=n), n, CHUNK, floor)
    timed("vit identity-LN", vit_stream(identity_ln=True, n=n), n, CHUNK,
          floor)


if __name__ == "__main__":
    main()
