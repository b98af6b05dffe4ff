"""Multi-host initialisation & cross-host utilities.

Replaces the reference's NCCL bring-up (InfVideoLLaMA/common/dist_utils.py:
57-90, infty-VideoChat2/utils/distributed.py:63-106 — env:// or SLURM tcp
rendezvous, port-collision retry). On TPU pods, `jax.distributed.initialize`
discovers peers from the TPU environment; collectives ride ICI within a slice
and DCN across slices with no backend plumbing.

Also provides the file-sync barrier pattern (rank-0 download + barrier,
dist_utils.py:117-137) as `main_process_first`, and metric reduction across
hosts (the reference's all_reduce-based MetricLogger sync).
"""

from __future__ import annotations

import contextlib
import os
from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["init_distributed", "process_index", "is_main_process", "barrier",
           "main_process_first", "all_mean_scalars"]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialise multi-host JAX. No-ops on single-host (the common case in
    eval); args come from the TPU metadata server when omitted.

    The decision to initialise is made from env/args only — touching
    jax.process_count() first would initialise the local backend and make
    jax.distributed.initialize() raise.
    """
    want = bool(coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if want:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


@contextlib.contextmanager
def main_process_first(name: str = "download"):
    """Rank 0 runs the body first (e.g. downloads a file), peers wait, then
    proceed — dist_utils.py:117-137 semantics."""
    if not is_main_process():
        barrier(f"{name}_enter")
    yield
    if is_main_process():
        barrier(f"{name}_enter")
    barrier(f"{name}_exit")


def all_mean_scalars(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean each scalar across hosts (MetricLogger.synchronize equivalent)."""
    if jax.process_count() <= 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.asarray([metrics[k] for k in keys], np.float32)
    summed = multihost_utils.process_allgather(vec).sum(0)
    return {k: float(v) / jax.process_count() for k, v in zip(keys, summed)}
