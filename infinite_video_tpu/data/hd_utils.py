"""HD dynamic-resolution transforms (port of infty-VideoChat2/dataset/hd_utils.py:6-103).

Two schemes used by the HD model variant (videochat2_it_hd_mistral.py):
  - padding mode (InternLM-XComposer2-HD style): scale the long side to the
    largest multiple of 224 whose tile count fits hd_num, pad the short side
    to a 224 multiple with white
  - no-padding mode (InternVL-1.5 style): snap to the closest (i, j) tile
    aspect ratio with i*j <= hd_num and resize exactly

Plus `tile_frames`: split the transformed frames into 224x224 tiles (+
optional global thumbnail view) for the ViT, in NHWC numpy.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["hd_transform_padding", "hd_transform_no_padding",
           "find_closest_aspect_ratio", "tile_frames", "tile_stack"]


def _resize_bicubic(frames: np.ndarray, h: int, w: int) -> np.ndarray:
    import cv2

    return np.stack([cv2.resize(f, (w, h), interpolation=cv2.INTER_CUBIC)
                     for f in frames])


def hd_transform_padding(frames: np.ndarray, image_size: int = 224,
                         hd_num: int = 6) -> np.ndarray:
    """frames [T, H, W, C] -> scaled + white-padded to 224-multiples.

    Reference quirk preserved (dataset/hd_utils.py:24-26,46-47): portrait
    inputs are handled with `flip(-2,-1)` — a MIRROR, not a transpose — while
    the scale targets use the swapped dims, so portrait videos come out
    aspect-inverted. That is exactly what the reference model was trained/
    evaluated with, so we replicate it rather than "fix" it."""
    t, h, w, c = frames.shape
    trans = w < h
    if trans:
        frames = np.flip(frames, (1, 2))
        h, w = w, h
    ratio = w / h
    scale = 1
    while scale * np.ceil(scale / ratio) <= hd_num:
        scale += 1
    scale -= 1
    new_w = int(scale * image_size)
    new_h = int(new_w / ratio)
    resized = _resize_bicubic(frames, new_h, new_w)
    tar = int(np.ceil(new_h / image_size) * image_size)
    top = (tar - new_h) // 2
    out = np.full((t, tar, new_w, c), 255 if frames.dtype == np.uint8 else 1.0,
                  dtype=resized.dtype)
    out[:, top:top + new_h] = resized
    if trans:
        out = np.flip(out, (1, 2))
    return np.ascontiguousarray(out)


def find_closest_aspect_ratio(aspect_ratio: float, target_ratios, width, height,
                              image_size) -> Tuple[int, int]:
    best_diff, best = float("inf"), (1, 1)
    area = width * height
    for ratio in target_ratios:
        target = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - target)
        if diff < best_diff:
            best_diff, best = diff, ratio
        elif diff == best_diff and area > 0.5 * image_size ** 2 * ratio[0] * ratio[1]:
            best = ratio
    return best


def hd_transform_no_padding(frames: np.ndarray, image_size: int = 224,
                            hd_num: int = 6) -> np.ndarray:
    t, h, w, c = frames.shape
    aspect = w / h
    ratios = sorted({(i, j) for n in range(1, hd_num + 1)
                     for i in range(1, n + 1) for j in range(1, n + 1)
                     if 1 <= i * j <= hd_num}, key=lambda x: x[0] * x[1])
    ti, tj = find_closest_aspect_ratio(aspect, ratios, w, h, image_size)
    return _resize_bicubic(frames, image_size * tj, image_size * ti)


def tile_frames(frames: np.ndarray, image_size: int = 224,
                add_global: bool = True) -> np.ndarray:
    """[T, H, W, C] (H, W multiples of image_size) -> [T*tiles(+T), s, s, C].

    Tiles row-major per frame; with `add_global`, a resized full-frame
    thumbnail is appended per frame (the HD variant's global view)."""
    t, h, w, c = frames.shape
    gh, gw = h // image_size, w // image_size
    tiles = frames.reshape(t, gh, image_size, gw, image_size, c)
    tiles = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(
        t, gh * gw, image_size, image_size, c)
    if add_global:
        thumb = _resize_bicubic(frames, image_size, image_size)[:, None]
        tiles = np.concatenate([tiles, thumb], axis=1)
    return tiles.reshape(-1, image_size, image_size, c)


def tile_stack(frames: np.ndarray, image_size: int = 224, hd_num: int = 6,
               add_global: bool = True, use_padding: bool = True,
               mean=None, std=None) -> np.ndarray:
    """One-stop HD tiling shared by training collate and the eval frame
    source: raw float01/uint8 frames [T, H, W, C] -> tile-major stack
    [n_tiles(+1 global), T, s, s, C], optionally CLIP-normalised.

    Tiles are row-major per frame with time preserved per tile (the layout
    VideoChat2Encoder.encode_hd consumes)."""
    f = frames.astype(np.float32)
    if frames.dtype == np.uint8:
        f = f / 255.0
    hd = (hd_transform_padding(f, image_size, hd_num) if use_padding
          else hd_transform_no_padding(f, image_size, hd_num))
    t, h, w, c = hd.shape
    s = image_size
    gh, gw = h // s, w // s
    tiles = hd.reshape(t, gh, s, gw, s, c).transpose(1, 3, 0, 2, 4, 5)
    tiles = tiles.reshape(gh * gw, t, s, s, c)
    if add_global:
        tiles = np.concatenate([tiles, _resize_bicubic(hd, s, s)[None]], axis=0)
    if mean is not None:
        tiles = ((tiles - np.asarray(mean, np.float32))
                 / np.asarray(std, np.float32))
    return np.ascontiguousarray(tiles.astype(np.float32))
