"""Multi-source interleaving + stateful sharded sampling (host-side, no torch).

TPU-native ports of the VC2 loading machinery:
  - `MetaLoader` (dataset/dataloader.py:10-56): random interleave of several
    named batch iterators. Every host derives the SAME order from a shared
    seed instead of a NCCL broadcast — on TPU all hosts run the same program,
    so a deterministic seeded shuffle replaces the rank-0 broadcast.
  - `MetaLoader_rs` resume behaviour (dataloader.py:59-110): `skip_num`
    consumed steps are subtracted per source and each source's sampler is
    fast-forwarded (`set_start_iter`).
  - `StatefulShardSampler` (dataset/sampler.py:8-66): per-rank contiguous
    shard, in-shard shuffle by (seed+epoch), and iteration-level resume.
  - `num_tries` fault tolerance (dataset/__init__.py:95-104): corrupt samples
    are resampled up to N times.
"""

from __future__ import annotations

import random
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

__all__ = ["StatefulShardSampler", "MetaLoader", "retrying"]


class StatefulShardSampler:
    """Per-rank contiguous shard + seeded shuffle + mid-epoch resume."""

    def __init__(self, dataset_len: int, batch_size: int, *, rank: int = 0,
                 num_replicas: int = 1, seed: int = 0):
        self.batch_size = batch_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.seed = seed
        self.epoch = 0
        self.start_iter = 0
        total = dataset_len - (dataset_len % num_replicas)
        self.num_samples = total // num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def set_start_iter(self, start_iter: int):
        self.start_iter = start_iter

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self) -> Iterator[int]:
        g = np.random.default_rng(self.epoch + self.seed)
        shuffling = g.permutation(self.num_samples)
        base = self.rank * self.num_samples
        indices = (base + shuffling).tolist()
        return iter(indices[self.start_iter * self.batch_size:])


class MetaLoader:
    """Random interleave of named iterables with identical cross-host order.

    name2loader: {name: iterable-with-len}; each yields (name, batch). With
    `skip_num`, the first skip_num interleave slots are dropped and each
    source's sampler (when it exposes set_start_iter) is fast-forwarded by
    its share — exactly MetaLoader_rs's resume protocol.
    """

    def __init__(self, name2loader: Dict[str, object], *, seed: int = 42,
                 skip_num: int = 0):
        self.name2loader = dict(name2loader)
        names = list(self.name2loader)
        order: List[str] = []
        for n in names:
            order.extend([n] * len(self.name2loader[n]))
        rng = random.Random(seed)
        rng.shuffle(order)

        if skip_num > 0:
            skipped = order[:skip_num]
            order = order[skip_num:]
            for n in names:
                media_steps = sum(1 for s in skipped if s == n)
                sampler = getattr(self.name2loader[n], "sampler", None)
                if sampler is not None and hasattr(sampler, "set_start_iter"):
                    sampler.set_start_iter(media_steps)
        self.iter_order = order
        self.name2iter = {n: iter(l) for n, l in self.name2loader.items()}

    def __len__(self) -> int:
        return len(self.iter_order)

    def __iter__(self):
        for name in self.iter_order:
            yield name, next(self.name2iter[name])

    def __str__(self) -> str:
        lines = [f"MetaLoader has {len(self.name2loader)} dataloaders, "
                 f"{len(self)} batches in total"]
        for i, (n, l) in enumerate(self.name2loader.items()):
            lines.append(f"dataloader index={i} name={n} length={len(l)}")
        return "\n".join(lines)


def retrying(fetch: Callable[[int], object], num_tries: int = 3,
             rng: Optional[random.Random] = None,
             dataset_len: Optional[int] = None) -> Callable[[int], object]:
    """Wrap an index-fetcher with resample-on-error fault tolerance."""
    rng = rng or random.Random(0)

    def safe_fetch(index: int):
        last = None
        for _ in range(num_tries):
            try:
                return fetch(index)
            except Exception as e:  # noqa: BLE001 — data faults by design
                last = e
                if dataset_len:
                    index = rng.randrange(dataset_len)
        raise RuntimeError(f"sample fetch failed after {num_tries} tries") from last

    return safe_fetch
