"""Frame extraction tool (port of eval_code/eval/extract_features.py:16-66).

Uniformly samples N frames per video, resizes to the target resolution, and
saves each video's frames as a .npy tensor [T, H, W, 3] uint8 — the
precomputed-frames path the reference eval drivers consume (they load saved
tensors instead of decoding at eval time,
run_inference_inf_video_llama_nextqa.py:218-229).

  python -m infinite_video_tpu.cli.extract_features \\
      --video-dir /data/videos --out-dir /data/frames --num-frames 2048
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--num-frames", type=int, default=2048)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--sampling", default="uniform",
                   choices=["uniform", "middle"])
    args = p.parse_args(argv)

    from infinite_video_tpu.data.video_reader import read_video_frames

    os.makedirs(args.out_dir, exist_ok=True)
    exts = (".mp4", ".avi", ".mkv", ".webm", ".mov")
    videos = sorted(f for f in os.listdir(args.video_dir)
                    if f.lower().endswith(exts))
    for i, name in enumerate(videos):
        out_path = os.path.join(args.out_dir,
                                os.path.splitext(name)[0] + ".npy")
        if os.path.exists(out_path):
            continue
        try:
            frames = read_video_frames(
                os.path.join(args.video_dir, name), args.num_frames,
                height=args.size, width=args.size, sampling=args.sampling)
        except IOError as e:
            print(f"skip {name}: {e}")
            continue
        np.save(out_path, frames)
        print(f"[{i + 1}/{len(videos)}] {name} -> {frames.shape}")


if __name__ == "__main__":
    main()
