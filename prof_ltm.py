"""Profile the LTM chunk step on TPU: where do the microseconds go?"""
import time
from functools import partial
import jax, jax.numpy as jnp
from infinite_video_tpu.ops import ltm

def timed(name, stream, n, frames_per_step):
    float(stream(999, n))  # compile
    best = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        float(stream(1000 + t, n))
        best = min(best, time.perf_counter() - t0)
    # subtract dispatch floor
    @jax.jit
    def trivial(seed):
        return jax.random.normal(jax.random.PRNGKey(seed), (8,)).sum()
    float(trivial(0))
    floor = 0.0
    for i in range(3):
        t0 = time.perf_counter(); float(trivial(i + 50))
        floor = min(floor or 1e9, time.perf_counter() - t0)
    per = (best - floor) / n
    print(f"{name:34s} {per*1e6:9.1f} us/step   ({frames_per_step/per:,.0f} frames/s)")
    return per

CH = 8
def make_stream(mode):
    cfg = ltm.LTMConfig(num_basis=256, chunk_len=CH, tokens_per_frame=32,
                        feature_dim=768, hidden_size=768, num_heads=12,
                        tau=0.75, sticky=True, use_pallas=(mode != "xla"))
    rng = jax.random.PRNGKey(0)
    kp, kv, kq = jax.random.split(rng, 3)
    params = {"key": {"kernel": jax.random.normal(kp, (768, 768)) * 0.02, "bias": jnp.zeros(768)},
              "value": {"kernel": jax.random.normal(kv, (768, 768)) * 0.02, "bias": jnp.zeros(768)}}
    queries = jax.random.normal(kq, (1, 32, 768)) * 0.5

    @partial(jax.jit, static_argnames="n")
    def stream(seed, n):
        def step(carry, _):
            state, key = carry
            key, sub, kd = jax.random.split(key, 3)
            chunk = jax.random.normal(kd, (1, CH * 32, 768)) * 0.5
            if mode == "datagen":
                return (state, key), chunk.sum()
            if mode == "consolidate":
                x = ltm.pool_frames(cfg, chunk)
                B = ltm.consolidate(cfg, state, x, sub)
                st = ltm.LTMState(B=B, sticky_mass=state.sticky_mass, step=state.step + 1)
                return (st, key), B.sum()
            ctx, state = ltm.ltm_attend(cfg, params, state, chunk, queries, sub)
            return (state, key), ctx.sum()
        init = (ltm.init_state(cfg, 1), jax.random.PRNGKey(seed))
        (_, _), sums = jax.lax.scan(step, init, None, length=n)
        return sums.sum()
    return stream

for mode in ["datagen", "consolidate", "full", "xla"]:
    timed(f"{mode}", make_stream(mode), 4096, CH)
