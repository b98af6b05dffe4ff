"""Full-size convert→serve dress rehearsal on the TPU: prove the `ivt-convert`
orbax artifact is byte-for-byte what the serving path loads, then serve from it.

Released ∞-Video weights don't exist in this environment, so this drives the
complete onboarding chain on SYNTHETIC full-geometry checkpoints with the
reference's own key layout (the same machinery as
tests/test_checkpoints_fullsize.py — reference torch modules random-init'd at
released-checkpoint geometry):

  1. generate a layered ∞-Video-LLaMA .pth chain (infinityqa.py:530-539
     load order):
       blip2_pretrained.pth : visual_encoder.* (EVA-g 1.0B, eva_vit.py
                              :388-423 geometry) + ln_vision.* + Qformer.*
                              (12-layer frame Q-former) + query_tokens
       finetune.pth         : video_Qformer.* (2-layer, LTM live) +
                              video_query_tokens +
                              video_frame_position_embedding + llama_proj
       finetune2.pth        : llama_proj override (tests last-wins overlay)
     plus llama.pth: HF-layout decoder at true 7B width (4096/32 heads/11008)
     and --decoder-layers depth (layout fidelity is per-layer; depth only
     scales bytes).
  2. run the REAL CLI (`python -m infinite_video_tpu.cli.convert`) in a
     subprocess → orbax artifact + unconsumed-key report.
  3. byte-for-byte: re-run the converter in-process on the same chain and
     compare EVERY leaf of the orbax restore against it (np.array_equal).
  4. serve from the artifact: restored encoder params drive the bf16 EVA-g
     pipeline, restored decoder params are int8-quantized
     (models/quantized.py — the serving onboarding step) and answer a
     question end-to-end on the chip via eval/engine.py.

Run from the repo root on a TPU runtime:
    python tools/convert_serve_rehearsal.py [--workdir /tmp/ivt_rehearsal]
                                            [--decoder-layers 2] [--keep]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

CHUNK_LEN = 8
NUM_BASIS = 256


def gen_chain(workdir: str, decoder_layers: int) -> dict:
    """Synthetic reference-layout .pth chain at full encoder geometry."""
    import gc
    from functools import partial

    import torch

    from gen_golden_qformer import build, load_reference_qformer
    from gen_golden_vit import _load, _stub_modules

    os.makedirs(workdir, exist_ok=True)
    t0 = time.perf_counter()

    _stub_modules()
    eva = _load("/root/reference/infty-Video-LLaMA/InfVideoLLaMA/models/"
                "eva_vit.py", "_ref_eva_vit_rehearsal")
    torch.manual_seed(0)
    vit = eva.VisionTransformer(
        img_size=224, patch_size=14, use_mean_pooling=False, embed_dim=1408,
        depth=39, num_heads=1408 // 88, mlp_ratio=4.3637, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6))
    sd1 = {f"visual_encoder.{k}": v for k, v in vit.state_dict().items()}
    del vit
    gc.collect()
    sd1["ln_vision.weight"] = torch.randn(1408) * 0.02 + 1.0
    sd1["ln_vision.bias"] = torch.randn(1408) * 0.02

    Q = load_reference_qformer()
    torch.manual_seed(1)
    # frame-level Q-former: stock BLIP-2 12-layer, freq=2, 1408-wide
    # cross-attention, LTM nulled (blip2.py:48-66)
    frame_q = build(Q, num_layers=12, freq=2, encoder_width=1408,
                    num_basis=64, alpha=1.0, sticky=False)
    sd1.update({f"Qformer.{k}": v for k, v in frame_q.state_dict().items()
                if not k.startswith("cls.")})
    sd1["query_tokens"] = torch.randn(1, 32, 768) * 0.02
    del frame_q
    gc.collect()
    p1 = os.path.join(workdir, "blip2_pretrained.pth")
    torch.save({"model": sd1}, p1)
    n1 = len(sd1)
    del sd1
    gc.collect()
    print(f"[{time.perf_counter()-t0:6.1f}s] wrote {p1} ({n1} keys)",
          flush=True)

    torch.manual_seed(2)
    # video Q-former: 2 layers, freq=1, LTM live (infinityqa.py:37-55)
    video_q = build(Q, num_layers=2, freq=1, encoder_width=768,
                    num_basis=NUM_BASIS, alpha=0.5, sticky=True)
    sd2 = {f"video_Qformer.{k}": v for k, v in video_q.state_dict().items()
           if not k.startswith("cls.")}
    del video_q
    sd2["video_query_tokens"] = torch.randn(1, 32, 768) * 0.02
    sd2["video_frame_position_embedding.weight"] = torch.randn(32, 768) * 0.02
    sd2["llama_proj.weight"] = torch.randn(4096, 768) * 0.02
    sd2["llama_proj.bias"] = torch.zeros(4096)
    p2 = os.path.join(workdir, "finetune.pth")
    torch.save({"model": sd2}, p2)
    print(f"[{time.perf_counter()-t0:6.1f}s] wrote {p2} ({len(sd2)} keys)",
          flush=True)

    # stage-2 override of llama_proj: the layered load is last-wins
    # (infinityqa.py ckpt then ckpt_2, both strict=False)
    torch.manual_seed(3)
    sd3 = {"llama_proj.weight": torch.randn(4096, 768) * 0.02,
           "llama_proj.bias": torch.randn(4096) * 0.01}
    p3 = os.path.join(workdir, "finetune2.pth")
    torch.save({"model": sd3}, p3)

    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(4)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=decoder_layers, num_attention_heads=32,
        num_key_value_heads=32, rms_norm_eps=1e-6,
        attn_implementation="eager", tie_word_embeddings=False))
    p4 = os.path.join(workdir, "llama.pth")
    torch.save(hf.state_dict(), p4)
    n4 = len(hf.state_dict())
    del hf
    gc.collect()
    print(f"[{time.perf_counter()-t0:6.1f}s] wrote {p4} ({n4} keys)",
          flush=True)
    return {"q_former_model": p1, "ckpt": p2, "ckpt_2": p3, "llm": p4}


def cli_args(chain: dict, outdir: str, decoder_layers: int):
    return ["--model", "infvideollama",
            "--q-former-model", chain["q_former_model"],
            "--ckpt", chain["ckpt"], "--ckpt-2", chain["ckpt_2"],
            "--llm", chain["llm"],
            "--max-int", str(CHUNK_LEN), "--num-basis", str(NUM_BASIS),
            "--alpha", "0.5", "--decoder-layers", str(decoder_layers),
            "--output-dir", outdir]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ivt_rehearsal")
    ap.add_argument("--decoder-layers", type=int, default=2)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir after a successful run")
    args = ap.parse_args()

    t0 = time.perf_counter()
    chain = gen_chain(args.workdir, args.decoder_layers)
    outdir = os.path.join(args.workdir, "converted")

    # 2. the real CLI in a subprocess (honest file roundtrip)
    cmd = [sys.executable, "-m", "infinite_video_tpu.cli.convert",
           *cli_args(chain, outdir, args.decoder_layers)]
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    if r.returncode != 0:
        sys.stderr.write(r.stderr)
        raise SystemExit(f"ivt-convert failed ({r.returncode})")
    print(f"[{time.perf_counter()-t0:6.1f}s] ivt-convert completed",
          flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        os.path.join(os.path.abspath(outdir), "params"))
    print(f"[{time.perf_counter()-t0:6.1f}s] orbax restore ok "
          f"(components: {sorted(restored.keys())})", flush=True)

    # 3. byte-for-byte: artifact leaves == the converter's in-process output
    from infinite_video_tpu.cli.convert import _convert, build_argparser

    cargs = build_argparser().parse_args(
        cli_args(chain, outdir, args.decoder_layers))
    cfg, enc_params, dec_params, _ = _convert(cargs)
    want = {"encoder": enc_params, "decoder": dec_params}
    flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_r = dict(
        (jax.tree_util.keystr(p), x) for p, x in
        jax.tree_util.tree_flatten_with_path(restored)[0])
    assert len(flat_w) == len(flat_r), (len(flat_w), len(flat_r))
    n_bytes = 0
    for p, leaf in flat_w:
        k = jax.tree_util.keystr(p)
        a, b = np.asarray(leaf), np.asarray(flat_r[k])
        assert a.dtype == b.dtype and a.shape == b.shape, (k, a.dtype, a.shape,
                                                           b.dtype, b.shape)
        assert np.array_equal(a, b), f"artifact leaf differs: {k}"
        n_bytes += a.nbytes
    print(f"[{time.perf_counter()-t0:6.1f}s] BYTE-FOR-BYTE OK: "
          f"{len(flat_w)} leaves, {n_bytes/1e9:.2f} GB", flush=True)
    del want, enc_params, dec_params, flat_w, flat_r

    # 4. serve from the artifact on the chip
    from infinite_video_tpu.eval.engine import LLaMAVideoQA
    from infinite_video_tpu.models import infinite_videollama as ivl
    from infinite_video_tpu.models.decoder import Decoder
    from infinite_video_tpu.models.quantized import quantize_decoder_params
    from infinite_video_tpu.utils.testing import ToyTokenizer

    encoder = ivl.InfVideoLLaMAEncoder(cfg)
    dec_cfg = dataclasses.replace(cfg.decoder, quantized=True,
                                  dtype=jnp.bfloat16)
    decoder = Decoder(dec_cfg)
    dec_q = quantize_decoder_params(restored["decoder"])
    engine = LLaMAVideoQA(encoder, restored["encoder"], decoder, dec_q,
                          ToyTokenizer(dec_cfg.vocab_size),
                          encoder.init_states)
    chunks = jax.random.normal(
        jax.random.PRNGKey(7),
        (args.chunks, 1, CHUNK_LEN, 224, 224, 3), jnp.bfloat16) * 0.5
    emb = engine.encode_video(chunks)
    assert emb.shape == (1, cfg.num_video_query_token, dec_cfg.hidden_size)
    assert bool(jnp.isfinite(emb.astype(jnp.float32)).all())
    print(f"[{time.perf_counter()-t0:6.1f}s] encoded "
          f"{args.chunks * CHUNK_LEN} frames -> {emb.shape}", flush=True)
    text = engine.answer(emb, "What happens in the video?",
                         max_new_tokens=8, do_sample=False)
    print(f"[{time.perf_counter()-t0:6.1f}s] decoded through converted "
          f"weights: {text[:60]!r}", flush=True)
    print("REHEARSAL OK: ivt-convert artifact == served params, "
          "end-to-end on the chip", flush=True)
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
