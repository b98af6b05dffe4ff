"""Ablate the EVA-g vision step on real hardware: where does the MFU go?

Decomposes the ViT's cost with two-length differenced dependency-chain
timing (tools/chain_timing.py): each mode times one jitted scan over a
variant of the ViT step with one component ablated, so (full - ablated)
isolates that component's cost. All rows use the XLA attention path
(like-for-like ablations); the pallas-vs-xla attention delta is measured by
tools/ab_vit_attention.py. NOTE: the round-3 version of this table used
floor subtraction with a ~24-iter chain; the relay floor was later observed
to swing 28-412 ms between sessions, so round-3 absolute ms/frame values
were inflated — trust the round-4 re-run in docs/KERNELS.md.

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


def timed(name, stream, n, frames_per_step, flops_per_frame=None):
    from chain_timing import two_len_time

    per_frame = two_len_time(stream, n) / frames_per_step
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
    import dataclasses

    # ablate against the XLA attention path so (full - ablated) rows all
    # compare like with like; the pallas-vs-xla delta is the A/B tool's job
    # (tools/ab_vit_attention.py)
    cfg = dataclasses.replace(eva_vit_g_config(dtype=jnp.bfloat16),
                              attn_impl="xla")
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
        # at BOTH two-length timing chain lengths (a different static n
        # would retrace outside the context with the patches reverted)
        float(run(params, 0, n))
        float(run(params, 1, max(1, n // 5)))
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

    cfg = eva_vit_g_config()
    s, d, mh = 257, cfg.embed_dim, cfg.mlp_hidden
    flops_block = 2 * (4 * s * d * d + 2 * s * d * mh + 2 * s * s * d)
    flops_frame = cfg.depth * flops_block + 2 * s * 588 * d
    print(f"EVA-g: {flops_frame/1e9:.0f} GFLOP/frame (S={s}, d={d}, "
          f"mlp={mh}, depth={cfg.depth})", flush=True)

    n = 120
    mm_flops = cfg.depth * 2 * (4 * s * d * d + 2 * s * d * mh)
    timed("matmuls-only roofline", matmul_roofline_stream(), n, CHUNK,
          mm_flops)
    full = timed("vit full (bf16)", vit_stream(n=n), n, CHUNK, flops_frame)
    timed("vit no-attn-einsums",
          vit_stream(attention_cls=_NoEinsumAttention, n=n), n, CHUNK)
    timed("vit no-softmax",
          vit_stream(attention_cls=_NoSoftmaxAttention, n=n), n, CHUNK)
    timed("vit f32-softmax",
          vit_stream(attention_cls=_F32SoftmaxAttention, n=n), n, CHUNK)
    timed("vit relu-for-gelu",
          vit_stream(gelu=lambda x, approximate=True: jax.nn.relu(x), n=n),
          n, CHUNK)
    _orig_gelu = jax.nn.gelu
    timed("vit tanh-gelu",
          vit_stream(gelu=lambda x, approximate=False: _orig_gelu(
              x, approximate=True), n=n), n, CHUNK)
    timed("vit identity-LN", vit_stream(identity_ln=True, n=n), n, CHUNK)


if __name__ == "__main__":
    main()
