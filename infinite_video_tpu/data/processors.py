"""Frame preprocessing: resize / crop / flip / normalize, host-side numpy.

Ports the Alpro video processors (InfVideoLLaMA/processors/video_processor.py:
118-225) and the VC2 per-encoder normalization table
(infty-VideoChat2/dataset/__init__.py:31-47). Output is float32 NHWC
([T, H, W, 3]), ready for the NHWC ViTs; augmentation (train processors) uses
a numpy Generator for reproducibility.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

__all__ = ["CLIP_MEAN", "CLIP_STD", "IMAGENET_MEAN", "IMAGENET_STD",
           "VideoProcessor", "RawProcessor", "eval_processor",
           "train_processor", "hd_raw_processor", "normalization_for_encoder"]

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalization_for_encoder(name: str) -> Tuple[Tuple, Tuple]:
    """dataset/__init__.py:31-47 dispatch."""
    if "beit" in name:
        return (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    if "clip" in name:
        return CLIP_MEAN, CLIP_STD
    return IMAGENET_MEAN, IMAGENET_STD


def _resize(frames: np.ndarray, size: int) -> np.ndarray:
    import cv2

    t, h, w, _ = frames.shape
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return np.stack([cv2.resize(f, (nw, nh), interpolation=cv2.INTER_CUBIC)
                     for f in frames])


def _center_crop(frames: np.ndarray, size: int) -> np.ndarray:
    _, h, w, _ = frames.shape
    top, left = (h - size) // 2, (w - size) // 2
    return frames[:, top:top + size, left:left + size]


@dataclasses.dataclass
class VideoProcessor:
    """resize(min-side) → crop → (flip) → (RandAugment) → [0,1] → normalize.

    `augment` (data/randaugment.py::RandAugment) runs on uint8 frames before
    the float conversion, matching the reference's ToUint8 → RandomAugment
    ordering (processors/randaugment.py)."""

    image_size: int = 224
    mean: Tuple = CLIP_MEAN
    std: Tuple = CLIP_STD
    random_crop: bool = False
    random_flip: bool = False
    augment: Optional[object] = None

    def __call__(self, frames: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        was_uint8 = frames.dtype == np.uint8
        if was_uint8:
            frames = frames.astype(np.float32) / 255.0
        frames = _resize(frames, self.image_size)
        if self.random_crop:
            _, h, w, _ = frames.shape
            top = int(rng.integers(0, h - self.image_size + 1))
            left = int(rng.integers(0, w - self.image_size + 1))
            frames = frames[:, top:top + self.image_size, left:left + self.image_size]
        else:
            frames = _center_crop(frames, self.image_size)
        if self.random_flip and rng.random() < 0.5:
            frames = frames[:, :, ::-1]
        if self.augment is not None:
            as_uint8 = np.clip(frames * 255.0, 0, 255).astype(np.uint8)
            frames = self.augment(np.ascontiguousarray(as_uint8),
                                  rng).astype(np.float32) / 255.0
        mean = np.asarray(self.mean, np.float32)
        std = np.asarray(self.std, np.float32)
        return ((frames - mean) / std).astype(np.float32)


def eval_processor(image_size: int = 224, mean=CLIP_MEAN, std=CLIP_STD) -> VideoProcessor:
    """AlproVideoEvalProcessor (video_processor.py:178-225)."""
    return VideoProcessor(image_size, mean, std, False, False)


def _register_processors():
    from infinite_video_tpu.utils.registry import registry

    @registry.register_processor("alpro_video_eval")
    class _Eval:
        from_config = staticmethod(
            lambda cfg=None: eval_processor(
                (cfg or {}).get("image_size", 224)))

    @registry.register_processor("alpro_video_train")
    class _Train:
        from_config = staticmethod(
            lambda cfg=None: train_processor(
                (cfg or {}).get("image_size", 224)))


_register_processors()


class RawProcessor:
    """Identity-geometry processor for the HD path: uint8 → float01 only.
    Resolution/aspect are preserved; the dynamic-resolution HD transform and
    normalisation happen later in training/collate.py::collate_hd_batch
    (matching the reference HD pipeline, dataset/hd_utils.py)."""

    def __call__(self, frames: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        if frames.dtype == np.uint8:
            return frames.astype(np.float32) / 255.0
        return frames.astype(np.float32)


def hd_raw_processor() -> RawProcessor:
    return RawProcessor()


def train_processor(image_size: int = 224, mean=CLIP_MEAN, std=CLIP_STD,
                    rand_aug: bool = False, rand_aug_n: int = 2,
                    rand_aug_m: int = 10) -> VideoProcessor:
    """AlproVideoTrainProcessor (video_processor.py:118-176). `rand_aug=True`
    adds the RandAugment op set (processors/randaugment.py) — shipped but
    unwired in the reference's own Compose, so it defaults off here too."""
    augment = None
    if rand_aug:
        from infinite_video_tpu.data.randaugment import RandAugment

        augment = RandAugment(n=rand_aug_n, m=rand_aug_m)
    return VideoProcessor(image_size, mean, std, True, True, augment)
