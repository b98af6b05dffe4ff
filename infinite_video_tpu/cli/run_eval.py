"""Benchmark eval launcher: NExT-QA / EgoSchema / Video-MME / MovieChat.

Replaces the reference's per-benchmark eval scripts
(eval_code/eval/run_inference_inf_video_llama_*.py,
infty-VideoChat2/eval_code/run_*_mistral.py) with one CLI:

  python -m infinite_video_tpu.cli.run_eval \\
      --benchmark nextqa --model videochat2 \\
      --data-path EgoSchema.csv --video-folder /data/videos \\
      --output-dir out/ --max-int 16 --num-samples 8 --num-basis 64 \\
      --tau 0.75 --alpha 1.0 --sticky \\
      --vit-ckpt vit_blip.pth --stage-ckpt stage3.pth \\
      --llm /path/mistral-7b --lora lora.pth

Predictions are resumable (skip answered keys); output dir encodes the
hyperparameters exactly as the reference does.
"""

from __future__ import annotations

import argparse
import json
import os


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--benchmark", required=True,
                   choices=["nextqa", "nextqa-oe", "nextoe", "egoschema",
                            "videomme", "moviechat", "moviechat-bp"])
    p.add_argument("--judge", default="",
                   help="nextoe judged scoring: 'openai' (OPENAI_API_KEY, "
                        "run_eval_qa_chatgpt.py protocol) or a dotted "
                        "'module:attr' chat function (messages -> reply)")
    p.add_argument("--judge-metric", default="GEN",
                   choices=["GEN", "CI", "DO", "CU", "TU", "CO"])
    p.add_argument("--model", default="videochat2",
                   choices=["videochat2", "infvideollama"])
    p.add_argument("--data-path", required=True, help="annotation csv/json/dir")
    p.add_argument("--video-folder", required=True,
                   help="videos dir, or .npy frame dir from extract_features")
    p.add_argument("--subtitle-folder", default="")
    p.add_argument("--output-dir", required=True)
    # LTM hyperparameters (reference argparse flags)
    p.add_argument("--max-int", type=int, default=16, help="frames per chunk")
    p.add_argument("--num-samples", type=int, default=8, help="chunks per video")
    p.add_argument("--num-basis", type=int, default=64)
    p.add_argument("--tau", type=float, default=0.75)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--sticky", action="store_true", default=True)
    p.add_argument("--no-sticky", dest="sticky", action="store_false")
    p.add_argument("--hd-num", type=int, default=0,
                   help="HD dynamic-resolution eval: max local 224px tiles "
                        "(+1 global view), run_egoschema_mistral_hd.py")
    p.add_argument("--baseline", action="store_true",
                   help="disable the LTM (stock Q-former control arm)")
    # checkpoints
    p.add_argument("--vit-ckpt", default="")
    p.add_argument("--stage-ckpt", default="")
    p.add_argument("--ckpt", default="")
    p.add_argument("--ckpt-2", default="")
    p.add_argument("--llm", default="", help="HF decoder directory")
    p.add_argument("--lora", default="")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fast-math", action="store_true",
                   help="bf16-MXU LTM serving mode (2.1x, ~6e-3 rel err)")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder (halves HBM/decode bandwidth)")
    p.add_argument("--int4", action="store_true",
                   help="int4 weight-only decoder, 128-input-group scales "
                        "(~3.6 GB for a 7B — quarter HBM; small accuracy "
                        "cost, serving opt-in)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache (quantize-on-write, per-row scales): "
                        "halves KV HBM for long chat sessions; orthogonal "
                        "to --int8/--int4 weight quantization")
    p.add_argument("--spec-decode", type=int, default=0, metavar="K",
                   help="speculative decoding: verify K prompt-lookup-"
                        "drafted tokens per decode step (greedy b1; exact "
                        "same output, fewer weight-streaming steps)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight engine (pipeline smoke/integration)")
    p.add_argument("--question-batch", type=int, default=1,
                   help="batch questions through encode+decode (mistral "
                        "engines; >1 = throughput mode beyond the reference)")
    p.add_argument("--num-shards", type=int, default=0,
                   help="shard questions across hosts (0 = jax.process_count)")
    p.add_argument("--shard-id", type=int, default=-1,
                   help="-1 = jax.process_index")
    return p


def _resolve_judge(spec: str):
    """'' -> None; 'openai' -> GPT judge (run_eval_qa_chatgpt.py:41-48);
    'module:attr' -> any chat function (messages -> reply string)."""
    if not spec:
        return None
    if spec == "openai":
        from openai import OpenAI

        client = OpenAI()

        def chat(messages):
            done = client.chat.completions.create(model="gpt-3.5-turbo",
                                                  messages=messages)
            return done.choices[0].message.content

        return chat
    import importlib

    mod, _, attr = spec.partition(":")
    fn = getattr(importlib.import_module(mod), attr)
    return fn() if isinstance(fn, type) else fn


def make_frame_source(video_folder: str, num_frames: int, chunk_len: int,
                      image_size: int = 224, hd_num: int = 0):
    """video name -> [C, 1, T, H, W, 3] normalized chunks; supports raw videos
    or .npy frame dumps from cli.extract_features, with C++ read-ahead when
    native prefetch is available. hd_num>0 emits dynamic-resolution tile
    stacks [C, n_tiles, T, s, s, 3] (run_egoschema_mistral_hd.py:313-332:
    HD transform on the whole sampled stack, then chunk along time)."""
    import numpy as np

    from infinite_video_tpu.data.processors import eval_processor
    from infinite_video_tpu.data.video_reader import chunk_frames, read_video_frames

    proc = eval_processor(image_size)

    def source(video_name: str):
        stem = os.path.splitext(video_name)[0]
        npy = os.path.join(video_folder, stem + ".npy")
        if os.path.exists(npy):
            frames = np.load(npy)
            if frames.shape[0] != num_frames:
                idx = np.linspace(0, frames.shape[0] - 1, num_frames).astype(int)
                frames = frames[idx]
        else:
            candidates = [os.path.join(video_folder, video_name)] + [
                os.path.join(video_folder, stem + ext)
                for ext in (".mp4", ".avi", ".mkv", ".webm", ".mov")
            ]
            path = next((p for p in candidates if os.path.exists(p)),
                        candidates[0])
            frames = read_video_frames(path, num_frames, sampling="middle")
        if hd_num:
            from infinite_video_tpu.data.hd_utils import tile_stack
            from infinite_video_tpu.data.processors import CLIP_MEAN, CLIP_STD

            tiles = tile_stack(frames, image_size, hd_num,
                               mean=CLIP_MEAN, std=CLIP_STD)
            nt, t_total = tiles.shape[0], tiles.shape[1]
            c = t_total // chunk_len
            tiles = tiles[:, : c * chunk_len].reshape(
                nt, c, chunk_len, image_size, image_size, tiles.shape[-1])
            return np.ascontiguousarray(tiles.transpose(1, 0, 2, 3, 4, 5))
        return chunk_frames(proc(frames), chunk_len)

    return source


def build_engine(args):
    engine, cfg = _build_engine(args)
    # prompt-lookup speculative decoding (runtime/generation.py): greedy-b1
    # answer() verifies K drafted tokens per weight-streaming decode step
    engine.spec_tokens = int(getattr(args, "spec_decode", 0))
    if getattr(args, "kv_int8", False):
        # int8 KV cache (DecoderConfig.kv_quant): orthogonal to weight
        # quantization — same params, cache buffers allocate as int8+scales.
        import dataclasses as _dc

        from infinite_video_tpu.models.decoder import Decoder as _Dec

        cfg_ = engine.decoder.cfg
        if not (_dc.is_dataclass(cfg_) and hasattr(cfg_, "kv_quant")):
            raise SystemExit(
                "--kv-int8: this model's decoder config "
                f"({type(cfg_).__name__}) does not support the int8 KV "
                "cache (no kv_quant field)")
        engine.decoder = _Dec(_dc.replace(cfg_, kv_quant=True))
    return engine, cfg


def _build_engine(args):
    import jax
    import jax.numpy as jnp

    if getattr(args, "tiny", False):
        return _build_tiny_engine(args)
    if args.model == "videochat2":
        from infinite_video_tpu.eval.engine import MistralVideoQA
        from infinite_video_tpu.models import videochat2 as vc2
        from infinite_video_tpu.models.decoder import Decoder

        cfg = vc2.default_config(chunk_len=args.max_int, num_basis=args.num_basis,
                                 tau=args.tau, alpha=args.alpha,
                                 sticky=args.sticky, num_frames=args.max_int,
                                 fast_math=args.fast_math)
        encoder = vc2.VideoChat2Encoder(cfg)
        decoder = Decoder(cfg.decoder)
        rng = jax.random.PRNGKey(args.seed)
        dummy = jnp.zeros((1, args.max_int, 224, 224, 3))
        enc_params = encoder.init(rng, dummy, encoder.init_states(1),
                                  instruction_ids=jnp.zeros((1, 4), jnp.int32)
                                  )["params"]
        dec_params = None
        if args.vit_ckpt or args.stage_ckpt:
            from infinite_video_tpu.convert.checkpoints import assemble_videochat2_params

            paths = [p for p in (args.vit_ckpt, args.stage_ckpt) if p]
            enc_params, dec_params = assemble_videochat2_params(
                enc_params, paths, decoder_path=args.llm or None,
                lora_path=args.lora or None)
        tokenizer = _load_tokenizer(args.llm)
        if dec_params is None:
            dec_params = _load_decoder_params(args.llm, decoder, rng)
        decoder, dec_params = _maybe_quantize(args, cfg, decoder, dec_params)
        return MistralVideoQA(encoder, enc_params, decoder, dec_params,
                              tokenizer, init_states=encoder.init_states,
                              hd_num=args.hd_num), cfg
    else:
        from infinite_video_tpu.eval.engine import LLaMAVideoQA
        from infinite_video_tpu.models import infinite_videollama as ivl
        from infinite_video_tpu.models.decoder import Decoder

        cfg = ivl.default_config(chunk_len=args.max_int, num_basis=args.num_basis,
                                 tau=args.tau, alpha=args.alpha,
                                 sticky=args.sticky, fast_math=args.fast_math)
        encoder = ivl.InfVideoLLaMAEncoder(cfg)
        decoder = Decoder(cfg.decoder)
        rng = jax.random.PRNGKey(args.seed)
        dummy = jnp.zeros((1, args.max_int, 224, 224, 3))
        enc_params = encoder.init(rng, dummy, encoder.init_states(1))["params"]
        if args.ckpt or args.ckpt_2:
            from infinite_video_tpu.convert.checkpoints import assemble_infvideollama_params

            paths = [p for p in (args.ckpt, args.ckpt_2) if p]
            enc_params, _ = assemble_infvideollama_params(enc_params, paths)
        tokenizer = _load_tokenizer(args.llm)
        dec_params = _load_decoder_params(args.llm, decoder, rng)
        decoder, dec_params = _maybe_quantize(args, cfg, decoder, dec_params)
        return LLaMAVideoQA(encoder, enc_params, decoder, dec_params, tokenizer,
                            init_states=encoder.init_states), cfg


def _build_tiny_engine(args):
    """Random-weight tiny engine for integration tests / plumbing smoke."""
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.eval.engine import MistralVideoQA
    from infinite_video_tpu.models import videochat2 as vc2
    from infinite_video_tpu.models.decoder import Decoder

    cfg = vc2.tiny_config(chunk_len=args.max_int)
    encoder = vc2.VideoChat2Encoder(cfg)
    decoder = Decoder(cfg.decoder)
    rng = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((1, args.max_int, 224, 224, 3))
    enc_params = encoder.init(rng, dummy, encoder.init_states(1),
                              instruction_ids=jnp.zeros((1, 4), jnp.int32)
                              )["params"]
    dec_params = decoder.init(jax.random.PRNGKey(1),
                              input_ids=jnp.zeros((1, 4), jnp.int32))["params"]

    from infinite_video_tpu.utils.testing import ToyTokenizer

    tok = ToyTokenizer(cfg.decoder.vocab_size)
    return MistralVideoQA(encoder, enc_params, decoder, dec_params, tok,
                          init_states=encoder.init_states,
                          qformer_tokenizer=tok,
                          hd_num=getattr(args, "hd_num", 0)), cfg


def _maybe_quantize(args, cfg, decoder, dec_params):
    int4 = getattr(args, "int4", False)
    if not (getattr(args, "int8", False) or int4):
        return decoder, dec_params
    import dataclasses

    from infinite_video_tpu.models.quantized import (QuantDecoder,
                                                     fuse_decoder_params,
                                                     quantize_decoder_params)

    # qkv fused (gate/up NOT — see DecoderConfig.fused_proj note): +9%
    # micro-batched decode (587 vs 540 tok/s b8 on v5e), b1-neutral.
    bits = 4 if int4 else 8
    qcfg = dataclasses.replace(cfg.decoder, fused_proj=True)
    params = fuse_decoder_params(quantize_decoder_params(dec_params,
                                                         bits=bits),
                                 qkv=True, mlp=False)
    return QuantDecoder(qcfg, bits=bits), params


def _load_tokenizer(llm_dir: str):
    if llm_dir:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(llm_dir)
    raise SystemExit("--llm is required (HF decoder directory with tokenizer)")


def _load_decoder_params(llm_dir: str, decoder, rng):
    import glob

    from infinite_video_tpu.convert.checkpoints import load_torch_state_dict
    from infinite_video_tpu.convert.decoder import convert_decoder_state_dict

    sd = {}
    patterns = ("pytorch_model*.bin", "*.pth")
    for pat in patterns:
        for shard in sorted(glob.glob(os.path.join(llm_dir, pat))):
            sd.update(load_torch_state_dict(shard))
    if not sd:
        raise SystemExit(f"no decoder weights found under {llm_dir}")
    return convert_decoder_state_dict(sd)


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from infinite_video_tpu.eval import drivers
    from infinite_video_tpu.eval.protocol import run_name

    if args.hd_num:
        # HD tile stacks ride the Mistral engine's sequential encode path
        # (tiles occupy the batch axis; run_egoschema_mistral_hd.py analogue)
        if args.model != "videochat2":
            raise SystemExit("--hd-num requires --model videochat2 "
                             "(the reference HD variant is VideoChat2-only)")
        if args.question_batch > 1:
            raise SystemExit("--hd-num is incompatible with "
                             "--question-batch>1: tiles occupy the batch "
                             "axis of the encoder")
        if args.benchmark == "moviechat-bp":
            raise SystemExit("--hd-num is not supported for moviechat-bp "
                             "(encode_video_chunks takes plain chunk "
                             "stacks only)")

    engine, cfg = build_engine(args)
    num_frames = args.max_int * args.num_samples
    source = make_frame_source(args.video_folder, num_frames, args.max_int,
                               hd_num=args.hd_num)

    name = run_name(max_int=args.max_int, num_basis=args.num_basis,
                    sticky=args.sticky, tau=args.tau, alpha=args.alpha)
    if args.baseline:
        name = f"nframes_{args.max_int}_baseline_normal"
    out = os.path.join(args.output_dir, name, f"{args.benchmark}_preds.json")

    def progress(i, total, key, pred):
        print(f"[{i + 1}/{total}] {key}: {pred}", flush=True)

    import jax as _jax

    n_shards = args.num_shards or _jax.process_count()
    shard_id = args.shard_id if args.shard_id >= 0 else _jax.process_index()
    shard = (shard_id, n_shards) if n_shards > 1 else None
    if shard:
        out = out.replace(".json", f".shard{shard_id}of{n_shards}.json")

    if args.benchmark == "nextqa":
        stats = drivers.run_nextqa_mistral(engine, args.data_path, source, out,
                                           progress, shard=shard,
                                           question_batch=args.question_batch)
    elif args.benchmark in ("nextqa-oe", "nextoe"):
        stats = drivers.run_nextoe(engine, args.data_path, source, out,
                                   progress,
                                   judge_chat_fn=_resolve_judge(args.judge),
                                   judge_metric=args.judge_metric)
    elif args.benchmark == "egoschema":
        stats = drivers.run_egoschema(engine, args.data_path, source, out,
                                      progress, shard=shard,
                                      question_batch=args.question_batch)
    elif args.benchmark == "videomme":
        stats = drivers.run_videomme(engine, args.data_path, source, out,
                                     subtitle_dir=args.subtitle_folder or None,
                                     progress=progress)
    elif args.benchmark == "moviechat-bp":
        stats = drivers.run_moviechat_breakpoint(engine, args.data_path,
                                                 source, out, progress)
    else:
        stats = drivers.run_moviechat_global(engine, args.data_path, source, out,
                                             progress)
    print(json.dumps(stats if isinstance(stats, dict) else {"done": True},
                     default=str))


if __name__ == "__main__":
    main()
