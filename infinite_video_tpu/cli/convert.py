"""Weight-onboarding CLI (ivt-convert): reference .pth chain → orbax.

One-command dress rehearsal for day-1 with real released weights. Mirrors the
reference's layered load orders —
  ∞-Video-LLaMA  (infinityqa.py:530-539): q_former_model → ckpt → ckpt_2
  ∞-VideoChat2   (run_nextqa_mistral.py:470-487): vit_blip → stage ckpt,
                 stage-3 LoRA merged into the Mistral weights
— runs the converters (convert/*.py), prints the unconsumed-key report
(strict=False, loudly), writes the converted {encoder, decoder} param trees
as an orbax checkpoint, and optionally smoke-decodes a few tokens through the
converted weights:

  ivt-convert --model videochat2 \\
      --vit-ckpt umt_l16_qformer.pth --stage-ckpt videochat2_mistral_stage3.pth \\
      --llm /path/Mistral-7B-Instruct-v0.2 --lora stage3_lora.pth \\
      --output-dir converted/ --smoke-decode
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="videochat2",
                   choices=["videochat2", "infvideollama"])
    # VideoChat2 chain
    p.add_argument("--vit-ckpt", default="", help="vit_blip (UMT + Q-former)")
    p.add_argument("--stage-ckpt", default="", help="videochat2 stage-2/3 .pth")
    p.add_argument("--lora", default="", help="stage-3 LoRA state_dict")
    p.add_argument("--lora-alpha", type=float, default=32.0)
    p.add_argument("--lora-r", type=int, default=16)
    # ∞-Video-LLaMA chain
    p.add_argument("--q-former-model", default="", help="BLIP-2 Q-former .pth")
    p.add_argument("--ckpt", default="", help="MiniGPT-4/Video-LLaMA ckpt")
    p.add_argument("--ckpt-2", default="", help="finetune ckpt")
    # decoder weights (HF directory of .bin/.pth shards, or a single file)
    p.add_argument("--llm", default="", help="HF decoder dir or .pth file")
    # geometry (matches run_eval flags)
    p.add_argument("--max-int", type=int, default=16, help="frames per chunk")
    p.add_argument("--num-basis", type=int, default=64)
    p.add_argument("--tau", type=float, default=0.75)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--sticky", action="store_true", default=True)
    p.add_argument("--no-sticky", dest="sticky", action="store_false")
    p.add_argument("--decoder-layers", type=int, default=0,
                   help="override decoder depth (0 = family default); the "
                        "converters are depth-agnostic")
    p.add_argument("--tiny", action="store_true",
                   help="tiny geometry (integration tests)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--smoke-decode", action="store_true",
                   help="greedy-decode 8 tokens through the converted "
                        "weights (zero video) and print the ids")
    p.add_argument("--seed", type=int, default=0)
    return p


def _load_llm_state_dict(llm: str):
    from infinite_video_tpu.convert.checkpoints import load_torch_state_dict

    if os.path.isfile(llm):
        return load_torch_state_dict(llm)
    sd = {}
    for pat in ("pytorch_model*.bin", "*.pth"):
        for shard in sorted(glob.glob(os.path.join(llm, pat))):
            sd.update(load_torch_state_dict(shard))
    if not sd:
        raise SystemExit(f"no decoder weights found under {llm}")
    return sd


def _convert(args):
    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.convert.checkpoints import (
        assemble_infvideollama_params, assemble_videochat2_params)
    from infinite_video_tpu.convert.decoder import (convert_decoder_state_dict,
                                                    merge_lora)

    report: dict = {}
    rng = jax.random.PRNGKey(args.seed)
    if args.model == "videochat2":
        from infinite_video_tpu.models import videochat2 as vc2

        cfg = (vc2.tiny_config() if args.tiny else vc2.default_config(
            chunk_len=args.max_int, num_basis=args.num_basis, tau=args.tau,
            alpha=args.alpha, sticky=args.sticky, num_frames=args.max_int))
        if args.decoder_layers:
            cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
                cfg.decoder, num_layers=args.decoder_layers))
        encoder = vc2.VideoChat2Encoder(cfg)
        t = cfg.vit.num_frames
        enc_params = encoder.init(
            rng, jnp.zeros((1, t, cfg.vit.img_size, cfg.vit.img_size, 3)),
            encoder.init_states(1),
            instruction_ids=jnp.zeros((1, 4), jnp.int32))["params"]
        paths = [p for p in (args.vit_ckpt, args.stage_ckpt) if p]
        # lora_path here only tells assemble that mistral_model.* adapter
        # keys in the stage ckpt are consumed elsewhere (merged below), so
        # they don't land in the unconsumed report
        enc_params, _ = assemble_videochat2_params(
            enc_params, paths, lora_path=args.lora or None, report=report)
    else:
        from infinite_video_tpu.models import infinite_videollama as ivl

        cfg = (ivl.tiny_config() if args.tiny else ivl.default_config(
            chunk_len=args.max_int, num_basis=args.num_basis, tau=args.tau,
            alpha=args.alpha, sticky=args.sticky))
        if args.decoder_layers:
            cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
                cfg.decoder, num_layers=args.decoder_layers))
        encoder = ivl.InfVideoLLaMAEncoder(cfg)
        s = cfg.vit.img_size
        t = cfg.video_qformer.ltm.chunk_len
        enc_params = encoder.init(rng, jnp.zeros((1, t, s, s, 3)),
                                  encoder.init_states(1))["params"]
        paths = [p for p in (args.q_former_model, args.ckpt, args.ckpt_2) if p]
        enc_params, _ = assemble_infvideollama_params(enc_params, paths,
                                                      report=report)

    dec_params = None
    if args.llm:
        sd = _load_llm_state_dict(args.llm)
        if args.lora:
            # stage-3 ckpts are mixed (encoder + adapter keys); only the
            # adapters flow into the decoder merge — base weights come
            # from --llm (run_nextqa_mistral.py:470-487 semantics)
            lora_sd = {k: v for k, v in _load_llm_state_dict(args.lora).items()
                       if ".lora_A." in k or ".lora_B." in k}
            if not lora_sd:
                raise SystemExit(f"no lora_A/lora_B keys in {args.lora}")
            sd = merge_lora({**sd, **lora_sd}, lora_alpha=args.lora_alpha,
                            r=args.lora_r)
        lost: list = []
        dec_params = convert_decoder_state_dict(sd, unconsumed=lost)
        if lost:
            report[args.llm] = lost
    return cfg, enc_params, dec_params, report


def main(argv=None):
    args = build_argparser().parse_args(argv)

    cfg, enc_params, dec_params, report = _convert(args)

    os.makedirs(args.output_dir, exist_ok=True)
    total_lost = sum(len(v) for v in report.values())
    print(f"unconsumed keys: {total_lost}")
    for path, keys in report.items():
        if keys:
            print(f"  {path}: {len(keys)} (first 5: {keys[:5]})")
    with open(os.path.join(args.output_dir, "unconsumed_report.json"),
              "w") as f:
        json.dump(report, f, indent=1)

    import orbax.checkpoint as ocp

    tree = {"encoder": enc_params}
    if dec_params is not None:
        tree["decoder"] = dec_params
    path = os.path.join(os.path.abspath(args.output_dir), "params")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    print(f"wrote orbax checkpoint: {path} "
          f"(components: {sorted(tree.keys())})")

    if args.smoke_decode:
        if dec_params is None:
            raise SystemExit("--smoke-decode needs --llm decoder weights")
        import jax
        import jax.numpy as jnp
        import numpy as np

        from infinite_video_tpu.models.decoder import Decoder
        from infinite_video_tpu.runtime.generation import (GenerationConfig,
                                                           generate)

        decoder = Decoder(cfg.decoder)
        # zero video -> encoder -> decoder: exercises every converted tree
        if args.model == "videochat2":
            from infinite_video_tpu.models import videochat2 as vc2

            encoder = vc2.VideoChat2Encoder(cfg)
            t = cfg.vit.num_frames
            emb, _ = encoder.apply(
                {"params": enc_params},
                jnp.zeros((1, t, cfg.vit.img_size, cfg.vit.img_size, 3)),
                encoder.init_states(1),
                instruction_ids=jnp.zeros((1, 4), jnp.int32))
        else:
            from infinite_video_tpu.models import infinite_videollama as ivl

            encoder = ivl.InfVideoLLaMAEncoder(cfg)
            s = cfg.vit.img_size
            t = cfg.video_qformer.ltm.chunk_len
            emb, _ = encoder.apply({"params": enc_params},
                                   jnp.zeros((1, t, s, s, 3)),
                                   encoder.init_states(1))
        out = generate(decoder, dec_params,
                       GenerationConfig(max_new_tokens=8, do_sample=False,
                                        eos_token_id=-1),
                       prompt_embeds=emb.astype(cfg.decoder.dtype))
        ids = np.asarray(out[0]).tolist()
        print(f"smoke decode OK: video emb {tuple(emb.shape)} -> tokens {ids}")


if __name__ == "__main__":
    main()
