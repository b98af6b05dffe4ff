"""RandAugment for video frames — host-side numpy/cv2, explicit PRNG.

Covers the reference op set (InfVideoLLaMA/processors/randaugment.py:
Identity, AutoContrast, Equalize, Rotate, Solarize, Color, Contrast,
Brightness, Sharpness, ShearX/Y, TranslateX/Y, Posterize) with the same
level→magnitude mappings (MAX_LEVEL=10, translate_const=10, gray fill 128).
Design differences from the reference, deliberate for a TPU data pipeline:

  * every random decision draws from an explicit `np.random.Generator`
    (reproducible per-sample augmentation for resumable input pipelines),
    instead of global `np.random` state;
  * operates on numpy uint8 [T, H, W, 3] end to end — augmentation runs on
    host CPU workers feeding the device queue, no torch tensors involved.

Photometric ops are 256-entry LUTs (PIL-compatible semantics); geometric ops
use cv2.warpAffine with bilinear sampling.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["RandAugment", "AUG_OPS"]

_MAX_LEVEL = 10
_TRANSLATE_CONST = 10
_FILL = (128, 128, 128)


def _lut(table: np.ndarray, img: np.ndarray) -> np.ndarray:
    return np.clip(table, 0, 255).astype(np.uint8)[img]


def _warp(img: np.ndarray, matrix: np.ndarray) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    return cv2.warpAffine(img, matrix.astype(np.float32), (w, h),
                          flags=cv2.INTER_LINEAR, borderValue=_FILL)


# ---- photometric ----------------------------------------------------------

def _autocontrast(img, _level, _rng):
    out = np.empty_like(img)
    for c in range(img.shape[-1]):
        ch = img[..., c]
        lo, hi = int(ch.min()), int(ch.max())
        if hi <= lo:
            out[..., c] = ch
        else:
            scale = 255.0 / (hi - lo)
            out[..., c] = _lut(np.arange(256) * scale - lo * scale, ch)
    return out


def _equalize(img, _level, _rng):
    # PIL.ImageOps.equalize semantics (per-channel histogram remap)
    out = np.empty_like(img)
    for c in range(img.shape[-1]):
        ch = img[..., c]
        hist = np.bincount(ch.reshape(-1), minlength=256)
        nonzero = hist[hist > 0]
        step = (nonzero[:-1].sum()) // 255 if nonzero.size > 1 else 0
        if step == 0:
            out[..., c] = ch
            continue
        shifted = np.concatenate([[step // 2], hist[:-1]])
        out[..., c] = _lut(np.cumsum(shifted) // step, ch)
    return out


def _solarize(img, level, _rng):
    thresh = int(level / _MAX_LEVEL * 256)
    table = np.arange(256)
    return _lut(np.where(table < thresh, table, 255 - table), img)


def _posterize(img, level, _rng):
    bits = int(level / _MAX_LEVEL * 4)
    return img & np.uint8((255 << (8 - bits)) & 255)


def _enhance_factor(level) -> float:
    return level / _MAX_LEVEL * 1.8 + 0.1


def _brightness(img, level, _rng):
    return _lut(np.arange(256, dtype=np.float32) * _enhance_factor(level), img)


def _contrast(img, level, _rng):
    # PIL pivots around the luma mean (ITU-R 601 weights)
    mean = float(np.dot(img.astype(np.float32).mean((0, 1)),
                        [0.299, 0.587, 0.114]))
    f = _enhance_factor(level)
    return _lut((np.arange(256) - mean) * f + mean, img)


def _color(img, level, _rng):
    # blend toward the luma-gray image: out = gray + f * (img - gray)
    f = _enhance_factor(level)
    gray = np.dot(img.astype(np.float32), [0.299, 0.587, 0.114])[..., None]
    return np.clip(gray + f * (img.astype(np.float32) - gray),
                   0, 255).astype(np.uint8)


def _sharpness(img, level, _rng):
    import cv2

    f = _enhance_factor(level)
    kernel = np.full((3, 3), 1.0, np.float32)
    kernel[1, 1] = 5.0
    kernel /= 13.0
    smooth = cv2.filter2D(img, -1, kernel).astype(np.float32)
    out = img.astype(np.float32)
    # PIL keeps a 1-pixel border unsharpened
    out[1:-1, 1:-1] = (smooth[1:-1, 1:-1]
                       + f * (out[1:-1, 1:-1] - smooth[1:-1, 1:-1]))
    return np.clip(out, 0, 255).astype(np.uint8)


# ---- geometric -------------------------------------------------------------

def _signed(rng, magnitude: float) -> float:
    return magnitude if rng.random() < 0.5 else -magnitude


def _rotate(img, level, rng):
    import cv2

    deg = _signed(rng, level / _MAX_LEVEL * 30.0)
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    return _warp(img, m)


def _shear_x(img, level, rng):
    s = _signed(rng, level / _MAX_LEVEL * 0.3)
    return _warp(img, np.array([[1, s, 0], [0, 1, 0]]))


def _shear_y(img, level, rng):
    s = _signed(rng, level / _MAX_LEVEL * 0.3)
    return _warp(img, np.array([[1, 0, 0], [s, 1, 0]]))


def _translate_x(img, level, rng):
    o = _signed(rng, level / _MAX_LEVEL * _TRANSLATE_CONST)
    return _warp(img, np.array([[1, 0, -o], [0, 1, 0]]))


def _translate_y(img, level, rng):
    o = _signed(rng, level / _MAX_LEVEL * _TRANSLATE_CONST)
    return _warp(img, np.array([[1, 0, 0], [0, 1, -o]]))


AUG_OPS = {
    "Identity": lambda img, level, rng: img,
    "AutoContrast": _autocontrast,
    "Equalize": _equalize,
    "Rotate": _rotate,
    "Solarize": _solarize,
    "Color": _color,
    "Contrast": _contrast,
    "Brightness": _brightness,
    "Sharpness": _sharpness,
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateX": _translate_x,
    "TranslateY": _translate_y,
    "Posterize": _posterize,
}


class RandAugment:
    """Sample `n` distinct ops per clip at magnitude `m`; each frame applies
    the same op sequence (temporally-consistent augmentation, the
    VideoRandomAugment behaviour) with per-op skip probability `p`."""

    def __init__(self, n: int = 2, m: int = 10, p: float = 0.0,
                 augs: Optional[Sequence[str]] = None):
        self.n = n
        self.m = m
        self.p = p
        self.augs = tuple(augs) if augs else tuple(AUG_OPS)
        unknown = set(self.augs) - set(AUG_OPS)
        if unknown:
            raise ValueError(f"unknown augmentation ops: {sorted(unknown)}")

    def __call__(self, frames: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """frames: uint8 [T, H, W, 3] -> uint8 [T, H, W, 3]."""
        if frames.dtype != np.uint8:
            raise TypeError(f"RandAugment expects uint8, got {frames.dtype}")
        rng = rng or np.random.default_rng()
        names = rng.choice(len(self.augs), size=self.n, replace=False)
        apply = rng.random(self.n) >= self.p
        out = []
        for f in frames:
            img = f
            for j, use in zip(names, apply):
                if use:
                    img = AUG_OPS[self.augs[int(j)]](img, self.m, rng)
            out.append(img)
        return np.stack(out)
