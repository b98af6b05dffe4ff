"""Ablate the LTM chunk step on real hardware: which part owns the microseconds?

Run from the repo root on a TPU runtime: `python tools/profile_ltm.py`.
Each mode times one jitted lax.scan whose body is a prefix of the chunk step
(dependency-chain methodology, see bench.py). Used for the round-2 honest
kernel verdict recorded in docs/KERNELS.md; keep for future perf work.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
from infinite_video_tpu.ops import ltm, gmatrix

CH = 8
N = 256

def timed(name, stream, n):
    float(stream(999, n))
    best = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        float(stream(1000 + t, n))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best/n*1e6:9.1f} us/step")

def make(mode):
    cfg = ltm.LTMConfig(num_basis=N, chunk_len=CH, tokens_per_frame=32,
                        feature_dim=768, hidden_size=768, num_heads=12,
                        tau=0.75, sticky=True,
                        use_pallas=(mode == "attn_pallas"))
    rng = jax.random.PRNGKey(0)
    kp, kv, kq = jax.random.split(rng, 3)
    params = {"key": {"kernel": jax.random.normal(kp, (768, 768)) * 0.02, "bias": jnp.zeros(768)},
              "value": {"kernel": jax.random.normal(kv, (768, 768)) * 0.02, "bias": jnp.zeros(768)}}
    queries = jax.random.normal(kq, (1, 32, 768)) * 0.5
    G_inf = jnp.asarray(gmatrix.compute_G_inf(N, CH, cfg.nb_samples, cfg.tau, cfg.ridge, cfg.basis))

    @partial(jax.jit, static_argnames="n")
    def stream(seed, n):
        def step(carry, _):
            state, key = carry
            key, sub, kd = jax.random.split(key, 3)
            chunk = jax.random.normal(kd, (1, CH * 32, 768)) * 0.5
            x = ltm.pool_frames(cfg, chunk)
            if mode == "pool":
                newB = state.B + x.sum() * 0
                out = x.sum()
            elif mode == "categorical":
                logits = jnp.log(jnp.clip(state.sticky_mass, 1e-30, None))
                bins = jax.random.categorical(sub, logits[:, None, :], axis=-1,
                                              shape=(1, cfg.nb_samples))
                newB = state.B + (bins.sum() * 0).astype(jnp.float32)
                out = bins.sum().astype(jnp.float32)
            elif mode == "xm_tau":
                xm = ltm._sticky_resample_gather(cfg, state, sub)
                newB = state.B + xm.sum() * 0
                out = xm.sum()
            elif mode == "refit":
                xm = ltm._sticky_resample_gather(cfg, state, sub)
                x_cat = jnp.concatenate([xm, x], axis=2)
                newB = jnp.einsum("bel,ln->bne", x_cat, G_inf,
                                  precision=jax.lax.Precision.HIGHEST)
                out = newB.sum()
            elif mode in ("attn_xla", "attn_pallas"):
                # full step (consolidate + project + attend)
                ctx, st = ltm.ltm_attend(cfg, params, state, chunk, queries, sub)
                return (st, key), ctx.sum()
            elif mode == "proj_only":
                keys = jnp.einsum("bne,eh->bnh", state.B, params["key"]["kernel"],
                                  precision=jax.lax.Precision.HIGHEST) + params["key"]["bias"]
                values = jnp.einsum("bne,eh->bnh", state.B, params["value"]["kernel"],
                                    precision=jax.lax.Precision.HIGHEST) + params["value"]["bias"]
                newB = state.B + keys.sum() * 0 + x.sum() * 0
                out = keys.sum() + values.sum()
            elif mode == "attend_only":
                keys = jnp.einsum("bne,eh->bnh", state.B, params["key"]["kernel"],
                                  precision=jax.lax.Precision.HIGHEST) + params["key"]["bias"]
                values = jnp.einsum("bne,eh->bnh", state.B, params["value"]["kernel"],
                                    precision=jax.lax.Precision.HIGHEST) + params["value"]["bias"]
                ctx, mass = ltm.continuous_attention(cfg, queries, keys, values)
                st = ltm.LTMState(B=state.B + x.sum() * 0, sticky_mass=mass,
                                  step=state.step + 1)
                return (st, key), ctx.sum()
            st = ltm.LTMState(B=newB, sticky_mass=state.sticky_mass, step=state.step + 1)
            return (st, key), out
        init = (ltm.init_state(cfg, 1), jax.random.PRNGKey(seed))
        (_, _), sums = jax.lax.scan(step, init, None, length=n)
        return sums.sum()
    return stream

for m in ["pool", "categorical", "xm_tau", "refit", "proj_only",
          "attend_only", "attn_xla", "attn_pallas"]:
    timed(m, make(m), 4096)
