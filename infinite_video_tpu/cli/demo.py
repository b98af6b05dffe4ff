"""Interactive chat demo (terminal REPL; the reference ships a Gradio app).

Port of Gradio_demo/app_gradio.py semantics — upload a video, then multi-turn
QA over it with the streaming LTM — as a dependency-free terminal loop.
Supports the reference's two modes:
  - Global mode: question after the full video (default)
  - Breakpoint mode: `--breakpoint mm:ss` encodes only up to the timestamp
    (the MovieChat-style middle-video question the reference UI exposes but
    whose handler it ships broken, app_gradio.py:203; semantics from
    infinityqa.py:233-236)

  python -m infinite_video_tpu.cli.demo --video-path clip.mp4 \\
      --ckpt ... --ckpt-2 ... --llama-model /path/vicuna-7b
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    from infinite_video_tpu.cli.infer import build_argparser

    p = build_argparser()
    # --question is interactive here (infer's parser provides --breakpoint)
    for a in p._actions:
        if a.dest == "question":
            a.required = False
            a.default = ""
    args = p.parse_args(argv)

    import numpy as np

    from infinite_video_tpu.cli import infer as infer_mod
    from infinite_video_tpu.data.processors import eval_processor
    from infinite_video_tpu.data.video_reader import (chunk_frames,
                                                      read_video_frames)

    # Build the engine through the infer module's path by asking one dummy
    # question setup; reuse its model construction by calling main() pieces is
    # messy, so we just re-run per question via the engine it builds.
    print("Chat over", args.video_path,
          "(each question runs the full pipeline; type 'exit' to quit)")

    history = []
    while True:
        try:
            q = input("You: ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not q or q.lower() in ("exit", "quit"):
            break
        answer = infer_mod.main([
            "--video-path", args.video_path, "--question", q,
            *(["--breakpoint", args.breakpoint] if args.breakpoint else []),
            *(["--smoke"] if args.smoke else []),
            *(["--ckpt", args.ckpt] if args.ckpt else []),
            *(["--ckpt-2", args.ckpt_2] if args.ckpt_2 else []),
            *(["--llama-model", args.llama_model] if args.llama_model else []),
        ])
        history.append((q, answer))
        print(f"Assistant: {answer}")


if __name__ == "__main__":
    main()
