"""Benchmark: LTM consolidation + continuous attention throughput per chip.

Measures the novel hot path of ∞-Video (SURVEY §3.3) at the EgoSchema recipe
geometry — N=256 bases, 8-frame chunks, 512 sticky resamples, 1000 integration
points, batch 1, 768-wide keys with 12 heads — streaming chunks through
`ltm_attend` under one jitted lax.scan on the default JAX backend.

Baseline: the reference torch implementation of the same computation on CPU
(LongTermAttention driven method-by-method in forward order,
long_term_attention_gibbs.py:288-318, skipping only the debug density pickle
at :320-345). If /root/reference is unavailable, a baseline measured on this
image's CPU is used (pinned below, with the command to re-measure).

Prints ONE JSON line:
  {"metric": ..., "value": frames/sec, "unit": "frames/s", "vs_baseline": x}
"""

import json
import os
import sys
import time

NUM_BASIS = 256
CHUNK_LEN = 8          # frames per chunk (EgoSchema recipe, README.md:47)
TOKENS_PER_FRAME = 32
NUM_CHUNKS = 1024      # chain-length delta for timing (see _jax_fps)
STICKY = True
# Fused Pallas integral kernel (ops/pallas/ltm_fused.py): measured 60 vs 72
# us/chunk against the XLA path on v5e.
import jax as _jax
USE_PALLAS = _jax.default_backend() == "tpu"

# CPU-reference frames/sec measured on this image (fallback when
# /root/reference is absent). Re-measure: python bench.py --measure-baseline
PINNED_CPU_BASELINE_FPS = None  # resolved at first run; see _torch_baseline


def _jax_fps() -> float:
    """Per-chunk time via chain-length differencing, chunks generated on-device.

    On tunneled TPU runtimes `block_until_ready` can return before remote
    execution finishes and identical (executable, inputs) pairs may be served
    from a relay cache, so: (a) every trial uses a fresh seed, (b) the scan is
    a true dependency chain (LTM state carry), (c) a scalar readback
    synchronises, and (d) two chain lengths are differenced to cancel the
    dispatch+readback latency. Chunk data is drawn inside the scan body from
    the carried PRNG key so chains can be long enough (~1000 steps) for the
    compute signal to dominate readback jitter without host-side data.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.ops import ltm

    cfg = ltm.LTMConfig(num_basis=NUM_BASIS, chunk_len=CHUNK_LEN,
                        tokens_per_frame=TOKENS_PER_FRAME, feature_dim=768,
                        hidden_size=768, num_heads=12, tau=0.75, sticky=STICKY,
                        use_pallas=USE_PALLAS)
    rng = jax.random.PRNGKey(0)
    kp, kv, kq = jax.random.split(rng, 3)
    params = {
        "key": {"kernel": jax.random.normal(kp, (768, 768)) * 0.02,
                "bias": jnp.zeros(768)},
        "value": {"kernel": jax.random.normal(kv, (768, 768)) * 0.02,
                  "bias": jnp.zeros(768)},
    }
    queries = jax.random.normal(kq, (1, 32, 768)) * 0.5

    @partial(jax.jit, static_argnames="n")
    def stream(params, queries, seed, n):
        def step(carry, _):
            state, key = carry
            key, sub, kd = jax.random.split(key, 3)
            chunk = jax.random.normal(
                kd, (1, CHUNK_LEN * TOKENS_PER_FRAME, 768)) * 0.5
            ctx, state = ltm.ltm_attend(cfg, params, state, chunk, queries, sub)
            return (state, key), ctx.sum()

        init = (ltm.init_state(cfg, 1), jax.random.PRNGKey(seed))
        (_, _), sums = jax.lax.scan(step, init, None, length=n)
        return sums.sum()

    n_small, n_large = 16, 16 + NUM_CHUNKS
    for n in (n_small, n_large):
        float(stream(params, queries, 999, n))  # compile

    def run(n, trials=3):
        best = float("inf")
        for t in range(trials):
            t0 = time.perf_counter()
            float(stream(params, queries, 1000 * n + t, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per_chunk = (run(n_large) - run(n_small)) / NUM_CHUNKS
    return CHUNK_LEN / max(per_chunk, 1e-9)


def _torch_baseline_fps() -> float:
    """Reference LongTermAttention on torch-CPU, forward order sans debug dump."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import torch
    from gen_golden_ltm import load_reference_ltm, make_ltm

    mod = load_reference_ltm()
    torch.manual_seed(0)
    proj_key = torch.nn.Linear(768, 768)
    proj_value = torch.nn.Linear(768, 768)
    ltm_ref = make_ltm(mod, NUM_BASIS, 0.75, STICKY, proj_key, proj_value)
    q = torch.randn(1, 32, 768) * 0.5
    chunks = [torch.randn(1, CHUNK_LEN * TOKENS_PER_FRAME, 768) * 0.5
              for _ in range(min(NUM_CHUNKS, 16))]

    def chunk_step(ltm_self, k, new_doc):
        # forward body (gibbs:288-318) via the reference's own methods,
        # skipping only the debug pickle tail (gibbs:320-345).
        ltm_self.device = k.device  # gibbs:289
        klen = int(k.size(1) / 32)
        ltm_self.length = klen
        batch_size, qlen = k.size(0), q.size(1)
        ltm_self.qlen, ltm_self.batch_size = qlen, q.size(0)
        ltm_self.d_head = ltm_self.head_size
        ltm_self.get_basis(klen, klen)
        if new_doc:
            ltm_self.B_past = None
            ltm_self.x_past = None
        kk = k.reshape(batch_size, klen, 32, 768).mean(dim=2).transpose(1, 2)
        B = ltm_self.update_inf(kk)
        keys = ltm_self.proj_key(B)
        values = ltm_self.proj_value(B)
        ltm_self.queries = q.view(batch_size, qlen, 12, 64).transpose(1, 2)
        ltm_self.keys = keys.view(batch_size, NUM_BASIS, 12, 64).transpose(1, 2)
        ltm_self.values = values.view(batch_size, NUM_BASIS, 12, 64).transpose(1, 2)
        return ltm_self.expected_value(ltm_self.score)

    with torch.no_grad():
        for i, ch in enumerate(chunks[:2]):  # warm caches
            chunk_step(ltm_ref, ch, i == 0)
        t0 = time.perf_counter()
        for i, ch in enumerate(chunks):
            chunk_step(ltm_ref, ch, i == 0)
        dt = time.perf_counter() - t0
    return len(chunks) * CHUNK_LEN / dt


def main():
    fps = _jax_fps()
    try:
        base = _torch_baseline_fps()
    except Exception:
        base = PINNED_CPU_BASELINE_FPS
    vs = (fps / base) if base else None
    print(json.dumps({
        "metric": "ltm_consolidate_attend_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
