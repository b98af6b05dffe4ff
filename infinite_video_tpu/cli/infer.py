"""Single-video QA CLI (port of infty-Video-LLaMA/inference.py).

Streams a video through the ∞-Video-LLaMA pipeline in chunks (constant-memory
LTM) and answers a question:

  python -m infinite_video_tpu.cli.infer \\
      --video-path clip.mp4 --question "What happens?" \\
      --ckpt ckpt.pth --ckpt-2 finetune.pth --llama-model /path/vicuna-7b \\
      --max-int 256 --num-basis 256 --tau 0.75 --alpha 1.0 --sticky

Checkpoints follow the reference's layered format (convert/checkpoints.py).
Without --llama-model/--ckpt this builds a random-weight model — useful only
for smoke-testing the pipeline (--smoke).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video-path", required=True)
    p.add_argument("--question", required=True)
    p.add_argument("--ckpt", default="", help="MiniGPT-4/Video-LLaMA checkpoint")
    p.add_argument("--ckpt-2", default="", help="finetune checkpoint")
    p.add_argument("--q-former-model", default="", help="BLIP-2 Q-former .pth")
    p.add_argument("--llama-model", default="", help="HF Vicuna-7B directory")
    p.add_argument("--max-int", type=int, default=256, help="frames per chunk")
    p.add_argument("--n-samples", type=int, default=4, help="number of chunks")
    p.add_argument("--num-basis", type=int, default=256)
    p.add_argument("--tau", type=float, default=0.75)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--sticky", action="store_true", default=True)
    p.add_argument("--no-sticky", dest="sticky", action="store_false")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--max-new-tokens", type=int, default=300)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fast-math", action="store_true",
                   help="bf16-MXU LTM serving mode (~2x, ~6e-3 rel err)")
    p.add_argument("--int8", action="store_true",
                   help="weight-only int8 decoder (single-chip 7B serving)")
    p.add_argument("--smoke", action="store_true",
                   help="random weights, tiny geometry (pipeline smoke test)")
    p.add_argument("--breakpoint", default="",
                   help="mm:ss — answer from the video prefix up to this "
                        "timestamp only (MovieChat-style middle-video QA)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from infinite_video_tpu.data.processors import eval_processor
    from infinite_video_tpu.data.video_reader import chunk_frames, read_video_frames
    from infinite_video_tpu.eval.engine import LLaMAVideoQA
    from infinite_video_tpu.models import infinite_videollama as ivl
    from infinite_video_tpu.models.decoder import Decoder

    if args.smoke:
        cfg = ivl.tiny_config()
        n_frames = cfg.video_qformer.ltm.chunk_len * 2
        image_size = cfg.vit.img_size
    else:
        cfg = ivl.default_config(chunk_len=args.max_int, num_basis=args.num_basis,
                                 tau=args.tau, alpha=args.alpha, sticky=args.sticky,
                                 fast_math=args.fast_math)
        n_frames = args.max_int * args.n_samples
        image_size = 224

    frames, fps, indices = read_video_frames(args.video_path, n_frames,
                                             return_fps=True)
    frames = eval_processor(image_size)(frames)
    chunk_len = (cfg.video_qformer.ltm.chunk_len if cfg.video_qformer.ltm
                 else args.max_int)
    chunks = chunk_frames(frames, chunk_len)
    if getattr(args, "breakpoint", ""):
        # keep only chunks whose frames fall before the breakpoint timestamp
        try:
            mm, ss = args.breakpoint.split(":")
            t_break = 60 * int(mm) + float(ss)
        except ValueError:
            raise SystemExit(
                f"--breakpoint must be mm:ss (got {args.breakpoint!r})")
        frame_times = [i / fps for i in indices[: chunks.shape[0] * chunk_len]]
        valid = sum(1 for t in frame_times[::chunk_len] if t <= t_break)
        chunks = chunks[: max(1, valid)]

    encoder = ivl.InfVideoLLaMAEncoder(cfg)
    dec_cfg = cfg.decoder
    if args.int8:
        import dataclasses as _dc

        dec_cfg = _dc.replace(dec_cfg, quantized=True)
    decoder = Decoder(dec_cfg)

    rng = jax.random.PRNGKey(args.seed)
    enc_params = encoder.init(rng, jnp.asarray(chunks[0]),
                              encoder.init_states(1))["params"]
    if args.ckpt or args.ckpt_2 or args.q_former_model:
        from infinite_video_tpu.convert.checkpoints import assemble_infvideollama_params

        paths = [p for p in (args.q_former_model, args.ckpt, args.ckpt_2) if p]
        enc_params, _ = assemble_infvideollama_params(enc_params, paths)

    if args.llama_model:
        from transformers import AutoTokenizer

        from infinite_video_tpu.convert.checkpoints import load_torch_state_dict
        from infinite_video_tpu.convert.decoder import convert_decoder_state_dict

        tokenizer = AutoTokenizer.from_pretrained(args.llama_model)
        import glob as _glob
        import os as _os

        dec_sd = {}
        for shard in sorted(_glob.glob(_os.path.join(args.llama_model,
                                                     "pytorch_model*.bin"))):
            dec_sd.update(load_torch_state_dict(shard))
        dec_params = convert_decoder_state_dict(dec_sd)
        if args.int8:
            from infinite_video_tpu.models.quantized import quantize_decoder_params

            dec_params = quantize_decoder_params(dec_params)
    else:
        class _ToyTok:
            eos_token_id = 2

            def __call__(self, text, add_special_tokens=False):
                ids = [abs(hash(w)) % cfg.decoder.vocab_size for w in text.split()]
                return {"input_ids": ([1] if add_special_tokens else []) + ids}

            def decode(self, ids, skip_special_tokens=True):
                return " ".join(f"tok{i}" for i in ids)

        tokenizer = _ToyTok()
        dec_params = decoder.init(jax.random.PRNGKey(1),
                                  input_ids=jnp.zeros((1, 4), jnp.int32))["params"]

    engine = LLaMAVideoQA(encoder, enc_params, decoder, dec_params, tokenizer,
                          init_states=lambda b: encoder.init_states(b))
    emb = engine.encode_video(jnp.asarray(chunks))
    answer = engine.answer(emb, args.question, max_new_tokens=args.max_new_tokens,
                           do_sample=True, temperature=args.temperature,
                           top_p=args.top_p, rng=jax.random.PRNGKey(args.seed))
    print(json.dumps({"question": args.question, "answer": answer}))
    return answer


if __name__ == "__main__":
    main()
