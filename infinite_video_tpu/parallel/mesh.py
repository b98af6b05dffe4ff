"""Device mesh construction for single- and multi-host TPU topologies.

The reference scales with NCCL DDP + DeepSpeed ZeRO
(infty-VideoChat2/tasks/shared_utils.py:50-54, utils/config_utils.py:46-60);
the TPU-native equivalent is a `jax.sharding.Mesh` with named axes:

  dp — data parallel (batch dimension; gradients all-reduce over ICI)
  tp — tensor parallel (decoder attention heads / MLP columns)

Sequence/context parallelism is intentionally absent: ∞-Video handles long
context *algorithmically* via the constant-size LTM carried through lax.scan
(SURVEY §2.9), so no ring attention is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "P"]


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("dp", "tp") mesh. dp defaults to n_devices // tp.

    For multi-host, callers run `jax.distributed.initialize()` first; the
    mesh spans all global devices and XLA routes collectives over ICI/DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
