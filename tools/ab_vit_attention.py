"""A/B the whole-row Pallas ViT attention vs XLA einsums on real hardware.

Times (a) attention-only at the EVA-g geometry ([CHUNK, 257, 16, 88] bf16),
(b) the full EVA-g ViT with ViTConfig.attn_impl flipped, both as two-length
differenced dependency-chain scans (tools/chain_timing.py). Results recorded
in docs/KERNELS.md — models/vit.py keys its "auto" default on this A/B.

Run from the repo root on a TPU runtime: `python tools/ab_vit_attention.py`.
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from infinite_video_tpu.models.vit import VisionTransformer, eva_vit_g_config
from infinite_video_tpu.ops.pallas.vit_attention import vit_attention

CHUNK = 8
S, H, D = 257, 16, 88


def timed(name, stream, n, flops=None):
    from chain_timing import two_len_time

    per = two_len_time(stream, n)
    line = f"{name:28s} {per*1e3:8.3f} ms/iter"
    if flops:
        line += f"  {flops/per/1e12:6.1f} TF/s issued"
    print(line, flush=True)
    return per


def attn_stream(impl: str, block_bh: int = 8):
    def xla_attn(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q * (D ** -0.5), k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    fn = (lambda q, k, v: vit_attention(q, k, v, block_bh=block_bh)) \
        if impl == "pallas" else xla_attn

    @partial(jax.jit, static_argnames="n")
    def run(seed, n):
        def step(key, _):
            key, kd = jax.random.split(key)
            qkv = jax.random.normal(kd, (3, CHUNK, S, H, D), jnp.bfloat16)
            out = fn(qkv[0], qkv[1], qkv[2])
            return key, out.astype(jnp.float32).sum()

        _, sums = jax.lax.scan(step, jax.random.PRNGKey(seed), None, length=n)
        return sums.sum()

    return lambda seed, n: run(seed, n)


def vit_stream(attn_impl: str):
    cfg = eva_vit_g_config(dtype=jnp.bfloat16)
    import dataclasses

    cfg = dataclasses.replace(cfg, attn_impl=attn_impl)
    model = VisionTransformer(cfg)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((CHUNK, 224, 224, 3), jnp.bfloat16))["params"])()

    @partial(jax.jit, static_argnames="n")
    def run(params, seed, n):
        def step(key, _):
            key, kd = jax.random.split(key)
            px = jax.random.normal(kd, (CHUNK, 224, 224, 3), jnp.bfloat16) * 0.5
            return key, model.apply({"params": params}, px).astype(
                jnp.float32).sum()

        _, sums = jax.lax.scan(step, jax.random.PRNGKey(seed), None, length=n)
        return sums.sum()

    return lambda seed, n: run(params, seed, n)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    # useful attention FLOPs per iter (padded lanes excluded; score+pv dots)
    flops = CHUNK * H * 2 * (S * S * D) * 2
    n = 256
    timed("attn xla einsums", attn_stream("xla"), n, flops)
    for bh in (4, 8, 16, 32):
        timed(f"attn pallas block_bh={bh}", attn_stream("pallas", bh), n,
              flops)
    n = 120
    fx = timed("vit full attn=xla", vit_stream("xla"), n)
    fp = timed("vit full attn=pallas", vit_stream("pallas"), n)
    fd = timed("vit full attn=pallas_direct", vit_stream("pallas_direct"), n)
    fk = timed("vit full attn=pallas_packed", vit_stream("pallas_packed"), n)
    fl = timed("vit full attn=pallas_layer", vit_stream("pallas_layer"), n)
    fq = timed("vit full attn=pallas_layer_proj",
               vit_stream("pallas_layer_proj"), n)
    print(f"layer-fused: {CHUNK/fl:.1f} f/s ({(fx/fl-1)*100:+.1f}% vs xla, "
          f"{(fk/fl-1)*100:+.1f}% vs packed)", flush=True)
    print(f"layer+proj:  {CHUNK/fq:.1f} f/s ({(fx/fq-1)*100:+.1f}% vs xla, "
          f"{(fl/fq-1)*100:+.1f}% vs layer)", flush=True)
    print(f"e2e: xla {CHUNK/fx:.1f} f/s vs pallas {CHUNK/fp:.1f} "
          f"({(fx/fp-1)*100:+.1f}%) vs direct {CHUNK/fd:.1f} f/s "
          f"({(fx/fd-1)*100:+.1f}%) vs packed {CHUNK/fk:.1f} f/s "
          f"({(fx/fk-1)*100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
