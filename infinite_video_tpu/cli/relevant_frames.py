"""Sticky-frame extraction CLI — the relevant_frames.py equivalent.

Given a saved density file (.npz with `masses` [C, layers, batch, nbins]
from eval.density.stream_collect_density, or a raw [nbins] array), prints the
top-k sticky frame indices per chunk window, optionally writes the heatmap
plot and the top-k frames as PNGs from the source video.

  python -m infinite_video_tpu.cli.relevant_frames --density masses.npz \\
      --num-frames 768 --chunk-size 256 --k 10 \\
      [--video clip.mp4 --frames-dir frames_out] [--plot chunks.png]

Matches infty-Video-LLaMA/relevant_frames.py: densities are averaged over
chunks/layers/batch, normalised, ranked per chunk window.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--density", required=True,
                   help=".npz with 'masses' (or a single array .npy)")
    p.add_argument("--num-frames", type=int, required=True)
    p.add_argument("--chunk-size", type=int, default=None)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--plot", default=None, help="heatmap output path")
    p.add_argument("--video", default=None, help="source video for frame dump")
    p.add_argument("--frames-dir", default=None)
    args = p.parse_args(argv)

    from infinite_video_tpu.eval.density import (density_to_frames,
                                                 plot_density_heatmap,
                                                 top_k_frames)

    if args.density.endswith(".npz"):
        data = np.load(args.density)
        mass = np.asarray(data["masses"] if "masses" in data else
                          data[data.files[0]])
    else:
        mass = np.load(args.density)
    # average over every leading axis (chunks, layers, batch) like the
    # reference's mean over (0, 1, 2) — relevant_frames.py:19
    while mass.ndim > 1:
        mass = mass.mean(0)

    tops = top_k_frames(mass, args.num_frames, args.k, args.chunk_size)
    chunk = args.chunk_size or args.num_frames
    for i, idx in enumerate(tops):
        lo, hi = i * chunk, min((i + 1) * chunk, args.num_frames) - 1
        print(f"Chunk {i + 1}: {lo} to {hi}")
        print(f"Top {len(idx)} sticky density indices: {idx.tolist()}")
        print("-" * 50)

    if args.plot:
        plot_density_heatmap(mass, args.num_frames, args.plot,
                             args.chunk_size)
        print(f"wrote {args.plot}")

    if args.video and args.frames_dir:
        import cv2

        from infinite_video_tpu.data.video_reader import read_video_frames

        os.makedirs(args.frames_dir, exist_ok=True)
        frames = read_video_frames(args.video, args.num_frames)
        for i, idx in enumerate(tops):
            for j in np.asarray(idx):
                path = os.path.join(args.frames_dir,
                                    f"frame_{i + 1}_{int(j)}.png")
                cv2.imwrite(path, cv2.cvtColor(frames[int(j)],
                                               cv2.COLOR_RGB2BGR))
        print(f"wrote frames to {args.frames_dir}")
    return tops


if __name__ == "__main__":
    main()
