"""Host-side video decode + frame sampling (decord replacement).

The reference decodes with decord (C++/CUDA-adjacent;
InfVideoLLaMA/processors/video_processor.py:25-56, VC2
eval_code/run_nextqa_mistral.py:313-344). On TPU hosts we decode with OpenCV
(ffmpeg-backed) on CPU, producing numpy [T, H, W, 3] uint8 in NHWC — the
layout the ViTs consume directly. Both reference sampling schemes are kept:

  - "uniform"  : arange(0, vlen, vlen/n) — LLaMA side (video_processor.py:34)
  - "middle"   : segment midpoints start + round(seg_size*i) — VC2 side
                 (run_nextqa_mistral.py:485-491 get_index)
  - "headtail" : random half from each half — training augmentation
                 (video_processor.py:36-38)

For throughput, `native.frame_cache.PrefetchingReader` (C++ ring buffer) can
wrap this reader to overlap decode with TPU compute.
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["sample_indices", "read_video_frames", "chunk_frames", "frame_message"]


def sample_indices(vlen: int, n_frames: int, sampling: str = "uniform",
                   rng: Optional[random.Random] = None) -> List[int]:
    """Always returns exactly n_frames indices.

    For videos shorter than n_frames, indices repeat — the VC2 `get_index`
    behaviour (run_nextqa_mistral.py:485-491 never caps), which keeps the
    chunk geometry static so one compilation serves every video and no empty
    chunk lists (⇒ NaN means) can occur. The LLaMA-side reference instead
    truncates to vlen (video_processor.py:32) and would break its own fixed
    chunking on short videos — a reference bug not replicated.
    """
    if sampling == "uniform":
        if n_frames <= vlen:
            n = n_frames
            return np.arange(0, vlen, vlen / n).astype(int).tolist()[:n]
        return np.linspace(0, vlen - 1, n_frames).astype(int).tolist()
    if sampling == "middle":
        seg = float(vlen - 1) / n_frames
        start = int(seg / 2)
        return [start + int(np.round(seg * i)) for i in range(n_frames)]
    if sampling == "headtail":
        n = min(n_frames, vlen)
        rng = rng or random
        head = sorted(rng.sample(range(vlen // 2), n // 2))
        tail = sorted(rng.sample(range(vlen // 2, vlen), n // 2))
        idx = head + tail
        while len(idx) < n_frames:
            idx.append(idx[-1])
        return idx
    raise NotImplementedError(sampling)


def read_video_frames(video_path: str, n_frames: int, *, height: int = -1,
                      width: int = -1, sampling: str = "uniform",
                      return_fps: bool = False):
    """Decode selected frames -> uint8 [T, H, W, 3] RGB (+ fps, indices)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {video_path}")
    vlen = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    indices = sample_indices(max(vlen, 1), n_frames, sampling)

    frames = []
    wanted = sorted(set(indices))
    got = {}
    pos = 0
    for idx in wanted:
        if idx != pos:
            cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ok, frame = cap.read()
        pos = idx + 1
        if not ok:
            break
        if height > 0 and width > 0:
            frame = cv2.resize(frame, (width, height),
                               interpolation=cv2.INTER_LINEAR)
        got[idx] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    cap.release()
    if not got:
        raise IOError(f"no decodable frames in {video_path}")
    last = got[max(got)]
    frames = [got.get(i, last) for i in indices]
    arr = np.stack(frames).astype(np.uint8)
    if return_fps:
        return arr, fps, indices
    return arr


def frame_message(indices, fps: float) -> str:
    """The 'sampled at … seconds' prompt suffix (video_processor.py:50-54)."""
    sec = ", ".join(str(round(i / fps, 1)) for i in indices)
    return f"The video contains {len(indices)} frames sampled at {sec} seconds. "


def chunk_frames(frames: np.ndarray, chunk_len: int) -> np.ndarray:
    """[T, H, W, 3] -> [C, 1, chunk_len, H, W, 3]; T must divide evenly
    (eval drivers sample T = chunk_len * num_chunks up front)."""
    t = frames.shape[0]
    c = t // chunk_len
    return frames[: c * chunk_len].reshape((c, 1, chunk_len) + frames.shape[1:])
