"""WebDataset-style tar-shard reader for the image-caption pretrain corpora.

First-party, stdlib replacement for the reference's `webdataset` pipelines
(InfVideoLLaMA/datasets/datasets/laion_dataset.py:17-24,
cc_sbu_dataset.py:12-21): laion / cc_sbu / cc3m ship as tar shards whose
members pair `<key>.jpg` with `<key>.json` ({"caption": ...}) or `<key>.txt`.
Semantics preserved:

  - ResampledShards: infinite seeded shard resampling (`resample=True`)
  - tarfile_to_samples + decode("pilrgb"): stream members, group by key,
    decode jpg -> RGB float01 [1, H, W, 3] (T=1 frame, the image convention
    of the pt stage)
  - shuffle(1000): bounded reservoir-style shuffle buffer
  - warn_and_continue: corrupt/incomplete samples are logged and skipped

No torch / webdataset dependency — tarfile + cv2 + numpy only.
"""

from __future__ import annotations

import io
import json
import logging
import os
import tarfile
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["WebDatasetShards", "expand_shard_pattern"]

log = logging.getLogger(__name__)

_IMAGE_EXTS = (".jpg", ".jpeg", ".png")
_TEXT_EXTS = (".json", ".txt")


def expand_shard_pattern(pattern: str) -> List[str]:
    """"{00000..00004}.tar" brace expansion (webdataset convention) or glob."""
    if "{" in pattern and ".." in pattern:
        head, rest = pattern.split("{", 1)
        rng, tail = rest.split("}", 1)
        lo, hi = rng.split("..")
        width = len(lo)
        return [f"{head}{i:0{width}d}{tail}" for i in range(int(lo), int(hi) + 1)]
    import glob

    hits = sorted(glob.glob(pattern))
    return hits if hits else [pattern]


def _decode_image(data: bytes) -> Optional[np.ndarray]:
    try:
        import cv2

        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if arr is None:
            return None
        return arr[:, :, ::-1].astype(np.float32) / 255.0  # BGR -> RGB float01
    except Exception:
        return None


def _decode_caption(name: str, data: bytes) -> Optional[str]:
    try:
        if name.endswith(".json"):
            return json.loads(data.decode("utf-8"))["caption"]
        return data.decode("utf-8").strip()
    except Exception:
        return None


class WebDatasetShards:
    """Iterable of (frames [1, H, W, 3] float01, caption) from tar shards.

    `processor` (optional) maps the [T, H, W, 3] image stack like the video
    processors do (resize/crop/normalize). With `resample=True` iteration is
    infinite (ResampledShards); bound it with itertools.islice or epoch_size.
    """

    def __init__(self, shards, processor: Optional[Callable] = None,
                 shuffle_buffer: int = 1000, seed: int = 0,
                 resample: bool = False, epoch_size: Optional[int] = None):
        if isinstance(shards, str):
            shards = expand_shard_pattern(shards)
        self.shards = list(shards)
        if not self.shards:
            raise ValueError("no shards")
        self.processor = processor
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.resample = resample
        self.epoch_size = epoch_size

    def _tar_samples(self, path: str) -> Iterator[Tuple[np.ndarray, str]]:
        """Group consecutive members by key; yield decoded pairs."""
        try:
            tf = tarfile.open(path, "r|*")  # streaming mode
        except Exception as e:
            log.warning("webdataset: cannot open shard %s: %s", path, e)
            return
        with tf:
            current_key, image, caption = None, None, None
            for member in tf:
                if not member.isfile():
                    continue
                base = os.path.basename(member.name)
                key, ext = os.path.splitext(base)
                ext = ext.lower()
                if ext not in _IMAGE_EXTS + _TEXT_EXTS:
                    continue
                if key != current_key:
                    if image is not None and caption is not None:
                        yield image, caption
                    elif current_key is not None:
                        log.warning("webdataset: incomplete sample %r skipped",
                                    current_key)
                    current_key, image, caption = key, None, None
                data = tf.extractfile(member).read()
                if ext in _IMAGE_EXTS:
                    image = _decode_image(data)
                    if image is None:
                        log.warning("webdataset: undecodable image %r",
                                    member.name)
                else:
                    caption = _decode_caption(base, data)
            if image is not None and caption is not None:
                yield image, caption

    def _raw_iter(self) -> Iterator[Tuple[np.ndarray, str]]:
        rng = np.random.default_rng(self.seed)
        if self.resample:
            while True:
                yield from self._tar_samples(
                    self.shards[int(rng.integers(len(self.shards)))])
        else:
            order = rng.permutation(len(self.shards))
            for i in order:
                yield from self._tar_samples(self.shards[int(i)])

    def __iter__(self) -> Iterator[Tuple[np.ndarray, str]]:
        rng = np.random.default_rng(self.seed + 1)
        buf: list = []
        count = 0

        def emit(sample):
            nonlocal count
            image, caption = sample
            frames = image[None]                      # [1, H, W, 3]
            if self.processor is not None:
                frames = self.processor(frames)
            count += 1
            return frames, caption

        for sample in self._raw_iter():
            if self.epoch_size is not None and count >= self.epoch_size:
                return
            if self.shuffle_buffer > 1:
                buf.append(sample)
                if len(buf) >= self.shuffle_buffer:
                    j = int(rng.integers(len(buf)))
                    buf[j], item = buf[-1], buf[j]
                    buf.pop()
                    yield emit(item)
            else:
                yield emit(sample)
        rng.shuffle(buf)
        for sample in buf:
            if self.epoch_size is not None and count >= self.epoch_size:
                return
            yield emit(sample)
