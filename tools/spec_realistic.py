"""Realistic speculative-decode numbers: what does prompt-lookup drafting
actually buy on naturalistic text?

BENCH_r03 recorded only a CEILING (echo draft context: 1086 tok/s at 9.0
tokens/step). The transferable measurement decomposes into two independent
factors, each measured here:

1. **Workload acceptance** (a text property, no model weights needed).
   Prompt-lookup drafting accepts tokens while the model's greedy pick keeps
   matching an earlier occurrence of the trailing n-gram. For an ORACLE model
   (greedy continuation == the actual document text) acceptance is a pure
   function of the token stream, computable from text alone — this is the
   standard way to estimate PLD acceptance and an upper bound on a real
   model's (tight for extractive QA, where the reference's eval answers
   quote the question's context). We tokenize local English prose with a
   byte-level BPE trained in-process (vocab 8192 — no downloadable tokenizer
   in this environment; `tokenizers` is the real HF trainer) and replay the
   EXACT in-graph draft function (`runtime.generation._ngram_draft`) inside
   a jitted simulation loop with the oracle as the verifier, over two
   workloads:
     - extractive-QA: context passage + question; the answer quotes a
       passage span verbatim (run_nextqa_mistral.py answer style);
     - free-form prose: continuation = the document's actual next tokens
       (self-repetition of natural English is all PLD can exploit).

2. **Hardware step costs** on the real int8 7B: T_plain (one plain decode
   step) and T_verify (one (K+1)-wide speculative verify step). The
   tok/s-vs-acceptance relation is structurally LINEAR — every verify step
   runs the same executable whatever gets accepted, so
   tok/s(tokens_per_step) = tokens_per_step / T_verify, exactly. (A
   corruption-controlled curve was tried first and failed honestly:
   random-weight greedy output self-cycles, so prompt-lookup finds perfect
   drafts in the committed region no matter how the draft context is
   corrupted — acceptance pinned at K+1. The linear model needs no
   acceptance control and its one measurable point, the echo ceiling,
   confirms it: 9.0/T_verify reproduces the measured ceiling tok/s.)

The realized figure for a workload = tokens_per_step(workload) / T_verify.
bench.py records both factors and the product as BENCH extras;
docs/KERNELS.md §3c carries the table.

Run from the repo root (TPU for the curve; text stats run anywhere):
    python tools/spec_realistic.py [--skip-hw]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import site
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = 8          # drafted tokens per verify step (bench geometry)
NGRAM = 3      # lookup n-gram (GenerationConfig.spec_ngram default)


# ---------------------------------------------------------------------------
# corpus + tokenizer (host side)

_WORDY = re.compile(r"[A-Za-z][a-z]+(?:\s+[A-Za-z][a-z]+){4,}")


def harvest_corpus(max_bytes: int = 6_000_000):
    """English prose paragraphs from installed packages' .md/.rst/.txt docs
    (public text shipped in the environment). Returns a list of documents
    (paragraph-joined, >= 1500 chars each)."""
    texts, total = [], 0
    for root in site.getsitepackages():
        for ext in ("md", "rst", "txt"):
            for f in sorted(glob.glob(os.path.join(root, "**", f"*.{ext}"),
                                      recursive=True)):
                try:
                    sz = os.path.getsize(f)
                    if sz < 3000 or sz > 300_000:
                        continue
                    with open(f, errors="ignore") as fh:
                        t = fh.read()
                except OSError:
                    continue
                # keep files that are mostly running prose, not tables/code
                if len(_WORDY.findall(t)) < 10:
                    continue
                texts.append(t)
                total += len(t)
                if total >= max_bytes:
                    return texts
    return texts


def train_tokenizer(docs, vocab_size: int = 8192):
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.trainers import BpeTrainer

    tok = Tokenizer(BPE(unk_token=None))
    tok.pre_tokenizer = ByteLevel(add_prefix_space=True)
    trainer = BpeTrainer(vocab_size=vocab_size, special_tokens=[],
                         initial_alphabet=ByteLevel.alphabet(),
                         show_progress=False)
    tok.train_from_iterator(docs, trainer)
    return tok


# ---------------------------------------------------------------------------
# oracle PLD simulation (device side, exact draft function)


@partial(jax.jit, static_argnames=("k", "ngram", "max_steps"))
def _simulate_oracle(ctx0, cur0, cont, cont_len, *, k: int = K,
                     ngram: int = NGRAM, max_steps: int = 160):
    """Replay the speculative loop of _generate_speculative_core with the
    model replaced by an oracle whose greedy pick at every position is the
    actual text (`cont`). Returns (per-step accepted counts [max_steps,
    -1 = unused], steps, committed)."""
    from infinite_video_tpu.runtime.generation import _ngram_draft

    def cond(st):
        t, cur, ctx, step, hist = st
        return (t < cont_len - (k + 1)) & (step < max_steps)

    def body(st):
        t, cur, ctx, step, hist = st
        last = cont[jnp.maximum(t - 1, 0)]
        draft = _ngram_draft(ctx, cur, last, k, ngram)
        truth = jax.lax.dynamic_slice(cont, (t,), (k,))
        accepted = jnp.sum(jnp.cumprod((draft == truth).astype(jnp.int32)))
        c = accepted + 1
        win = jax.lax.dynamic_slice(cont, (t,), (k + 1,))
        # write only the committed prefix: positions >= c keep old ctx values
        old = jax.lax.dynamic_slice(ctx, (cur,), (k + 1,))
        win = jnp.where(jnp.arange(k + 1) < c, win, old)
        ctx = jax.lax.dynamic_update_slice(ctx, win, (cur,))
        hist = hist.at[step].set(accepted)
        return t + c, cur + c, ctx, step + 1, hist

    # the prefill commits cont[0] before the loop (generate() semantics)
    ctx0 = jax.lax.dynamic_update_slice(ctx0, cont[:1], (cur0,))
    hist0 = jnp.full((max_steps,), -1, jnp.int32)
    st = (jnp.asarray(1, jnp.int32), cur0 + 1, ctx0,
          jnp.asarray(0, jnp.int32), hist0)
    t, cur, ctx, steps, hist = jax.lax.while_loop(cond, body, st)
    return hist, steps, t


def _pad_ctx(prompt_ids, gen_room):
    total = len(prompt_ids) + gen_room
    padded = -(-total // 128) * 128
    ctx = np.full((padded,), -1, np.int32)
    start = padded - gen_room
    ctx[start - len(prompt_ids):start] = prompt_ids
    return jnp.asarray(ctx), start


def measure_text_acceptance(n_samples: int = 40, seed: int = 0):
    """Returns {"qa": {...}, "prose": {...}} with tokens_per_step (committed
    per verify step, the realized speedup factor), accept histogram, and
    sample counts."""
    docs = harvest_corpus()
    if len(docs) < 10:
        raise RuntimeError(f"only {len(docs)} prose docs found")
    tok = train_tokenizer(docs)
    rng = np.random.default_rng(seed)
    enc = [np.asarray(tok.encode(d).ids, np.int32) for d in docs]
    enc = [e for e in enc if len(e) >= 768]
    qa_suffix = np.asarray(tok.encode(
        "\nQuestion: what does the passage say about this?\n"
        "Answer with the passage's own words: ").ids, np.int32)

    def one(workload, doc):
        if workload == "qa":
            # passage of 400 tokens; the answer quotes a 48-token span
            # from its middle (extractive, run_nextqa answer style)
            s = rng.integers(0, len(doc) - 520)
            passage = doc[s:s + 400]
            a = rng.integers(64, 288)
            cont = passage[a:a + 48]
            prompt = np.concatenate([passage, qa_suffix])
            max_steps = 60
        else:
            s = rng.integers(0, len(doc) - 520)
            prompt = doc[s:s + 384]
            cont = doc[s + 384:s + 384 + 128]
            max_steps = 130
        cont_buf = np.full((len(cont) + K + 2,), 0, np.int32)
        cont_buf[:len(cont)] = cont
        ctx, start = _pad_ctx(prompt.tolist(), len(cont) + K + 2)
        hist, steps, committed = _simulate_oracle(
            ctx, jnp.asarray(start, jnp.int32), jnp.asarray(cont_buf),
            jnp.asarray(len(cont), jnp.int32), max_steps=160)
        hist = np.asarray(hist)
        return hist[hist >= 0], int(steps), int(committed)

    out = {}
    for workload in ("qa", "prose"):
        hists, steps, committed = [], 0, 0
        for i in range(n_samples):
            doc = enc[rng.integers(0, len(enc))]
            h, s, c = one(workload, doc)
            hists.append(h)
            steps += s
            committed += c
        hist = np.concatenate(hists)
        binc = np.bincount(hist, minlength=K + 1)
        out[workload] = {
            "tokens_per_step": round(committed / max(steps, 1), 3),
            "accept_hist": binc.tolist(),
            "samples": n_samples,
            "verify_steps": steps,
        }
    return out


# ---------------------------------------------------------------------------
# hardware transfer curve (TPU)


def hw_step_costs(prefill: int = 128, n_base: int = 16, n_long: int = 144,
                  k: int = K, batch: int = 1):
    """Measure (T_plain, T_verify) seconds on the int8 7B through the real
    generate() path. T_verify comes from the echo-draft spec run: wall-time
    difference of same-seed long/base runs over the difference in verify
    steps (stats from return_spec_stats). Timing: same-seed long-minus-base
    differencing (fixed dispatch cancels); fresh seeds per timed dispatch
    (the relay cannot replay). batch > 1 exercises the batched ragged-commit
    speculative core (runtime/generation.py) with per-row echo drafts;
    T_verify is then the cost of one BATCH-wide verify step (aggregate
    tok/s = batch * tokens_per_step / T_verify)."""
    import dataclasses

    from infinite_video_tpu.models.decoder import Decoder, mistral7b_config
    from infinite_video_tpu.runtime.generation import (GenerationConfig,
                                                       generate)

    cfg = dataclasses.replace(mistral7b_config(), quantized=True,
                              fused_proj=True)
    model = Decoder(cfg)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           input_ids=jnp.zeros((1, 1), jnp.int32))["params"])()

    def gcfg(n, spec):
        return GenerationConfig(max_new_tokens=n, do_sample=False,
                                eos_token_id=-1, pad_token_id=0,
                                spec_tokens=spec)

    def emb_for(seed):
        return jax.random.normal(jax.random.PRNGKey(seed),
                                 (batch, prefill, cfg.hidden_size),
                                 jnp.bfloat16)

    def run(seed, n, spec, draft=None):
        t0 = time.perf_counter()
        toks = np.asarray(generate(model, params, gcfg(n, spec),
                                   prompt_embeds=emb_for(seed),
                                   draft_ids=draft))
        return time.perf_counter() - t0, toks

    def steps_of(seed, n, draft):
        _, stats = generate(model, params, gcfg(n, k),
                            prompt_embeds=emb_for(seed), draft_ids=draft,
                            return_spec_stats=True)
        return stats["verify_steps"]

    def echo(toks):
        # per-row echo drafts; the b1 core takes one 1-D array, the batched
        # core a list of per-row arrays
        return toks[0] if batch == 1 else list(toks)

    # warm all four executables
    _, warm = run(100, n_long, 0)
    run(100, n_base, 0)
    run(100, n_long, k, draft=echo(warm))
    run(100, n_base, k, draft=echo(warm))

    t_plain = float("inf")
    for seed in (31, 32):
        tb, _ = run(seed, n_base, 0)
        tl, _ = run(seed, n_long, 0)
        t_plain = min(t_plain, max(tl - tb, 1e-9) / (n_long - n_base))

    t_verify = float("inf")
    for seed in (41, 42):
        _, toks = run(seed, n_long, 0)   # echo draft for THIS prompt
        d = echo(toks)
        tb, _ = run(seed, n_base, k, draft=d)
        tl, _ = run(seed, n_long, k, draft=d)
        ds = steps_of(seed, n_long, d) - steps_of(seed, n_base, d)
        if ds > 0:
            t_verify = min(t_verify, max(tl - tb, 1e-9) / ds)
    return t_plain, t_verify


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-hw", action="store_true")
    ap.add_argument("--samples", type=int, default=40)
    args = ap.parse_args()

    print("measuring workload acceptance (oracle PLD on local prose)...",
          flush=True)
    text = measure_text_acceptance(args.samples)
    for w, r in text.items():
        print(f"  {w:6s}: {r['tokens_per_step']:.2f} tokens/step over "
              f"{r['verify_steps']} verify steps; accept hist "
              f"{r['accept_hist']}", flush=True)
    if args.skip_hw:
        return
    print("measuring hardware step costs (int8 7B, v5e)...", flush=True)
    t_plain, t_verify = hw_step_costs()
    print(f"  T_plain={t_plain*1e3:.2f} ms ({1/t_plain:.1f} tok/s), "
          f"T_verify={t_verify*1e3:.2f} ms", flush=True)
    for w, r in text.items():
        tok_s = r["tokens_per_step"] / t_verify
        print(f"  realized {w:6s}: {tok_s:.1f} tok/s at "
              f"{r['tokens_per_step']:.2f} tokens/step "
              f"({tok_s * t_plain:.2f}x plain)", flush=True)


if __name__ == "__main__":
    main()
