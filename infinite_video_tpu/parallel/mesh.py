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
              devices: Optional[Sequence] = None,
              dcn_dp: Optional[int] = None) -> Mesh:
    """Build a ("dp", "tp") mesh — or ("dcn", "dp", "tp") across slices.

    Placement is ICI-topology-aware: on real TPU topologies the device grid
    comes from `mesh_utils.create_device_mesh`, so the tp axis lands on
    physically adjacent chips (matmul collectives ride ICI) and dp spans the
    rest. `dcn_dp` adds a leading data-parallel axis across slices/hosts via
    `create_hybrid_device_mesh` — gradients all-reduce over DCN only on that
    axis. For multi-host, callers run `jax.distributed.initialize()` first.
    Falls back to a reshape for explicit device lists and host-emulated
    platforms (no physical topology to optimise).
    """
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dcn_dp:
        from jax.experimental import mesh_utils

        per_slice = n // dcn_dp
        if dp is None:
            dp = per_slice // tp
        if dcn_dp * dp * tp != n:
            raise ValueError(f"mesh {dcn_dp}x{dp}x{tp} != {n} devices")
        if hasattr(devices[0], "slice_index"):
            arr = mesh_utils.create_hybrid_device_mesh(
                (dp, tp), (dcn_dp, 1), devices=devices)
            # hybrid mesh is (dcn*dp, tp); lift the dcn axis out front
            arr = np.asarray(arr).reshape(dcn_dp, dp, tp)
        else:
            # host-emulated devices carry no slice topology; contiguous
            # blocks per dcn row preserve the intended locality
            arr = np.array(devices).reshape(dcn_dp, dp, tp)
        return Mesh(arr, axis_names=("dcn", "dp", "tp"))
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    if not explicit and devices and devices[0].platform == "tpu":
        from jax.experimental import mesh_utils

        try:
            arr = mesh_utils.create_device_mesh((dp, tp), devices=devices)
            return Mesh(arr, axis_names=("dp", "tp"))
        except (ValueError, AssertionError):
            pass  # odd topologies (e.g. v5e-1) — plain reshape below
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over every data-parallel axis of the
    mesh — ("dcn", "dp") on hybrid multi-slice meshes, "dp" otherwise —
    replicate the rest."""
    data_axes = tuple(a for a in ("dcn", "dp") if a in mesh.axis_names)
    lead = data_axes if len(data_axes) > 1 else data_axes[0]
    return NamedSharding(mesh, P(lead, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
