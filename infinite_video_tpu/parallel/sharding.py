"""Parameter partition rules: path-pattern → PartitionSpec.

Tensor parallelism for the 7B decoder follows the Megatron layout expressed
as shardings (no explicit collectives — XLA inserts them):
  q/k/v_proj kernels   : columns over tp  (heads split)
  o_proj kernel        : rows over tp     (psum'd by XLA)
  gate/up_proj kernels : columns over tp
  down_proj kernel     : rows over tp
  embed / lm_head      : vocab over tp
Everything else (Q-former, ViT, LTM G-constants) is replicated — they are
<1.1B params combined and run per-chunk, while the decoder dominates.

Optimizer state is handled separately: `zero_shardings` partitions every
param-shaped optimizer leaf over the dp axis on top of its TP spec — the
TPU-native equivalent of DeepSpeed ZeRO stage 1/2
(infty-VideoChat2/tasks/shared_utils_ds.py:58-61,
utils/config_utils.py:46-60), where Adam moments live sharded across
data-parallel workers while params stay replicated over dp. The update
gather happens inside the jitted train step via sharding constraints
(training/trainer.py::make_train_step with zero=True).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["DECODER_TP_RULES", "partition_spec_for", "tree_shardings",
           "shard_params", "zero_spec", "zero_shardings"]

# (regex over "/"-joined param path, PartitionSpec)
DECODER_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, "tp")),
    (r".*o_proj/kernel$", P("tp", None)),
    (r".*(gate_proj|up_proj)/kernel$", P(None, "tp")),
    (r".*down_proj/kernel$", P("tp", None)),
    (r".*embed_tokens/embedding$", P("tp", None)),
    (r".*lm_head/kernel$", P(None, "tp")),
)


def partition_spec_for(path: str, rules: Sequence[Tuple[str, P]] = DECODER_TP_RULES) -> P:
    for pat, spec in rules:
        if re.match(pat, path):
            return spec
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def tree_shardings(params, mesh: Mesh,
                   rules: Sequence[Tuple[str, P]] = DECODER_TP_RULES):
    """NamedSharding tree matching `params`' structure."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, _ in flat:
        specs[_path_str(path)] = partition_spec_for(_path_str(path), rules)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, specs[_path_str(p)]), params)


def shard_params(params, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = DECODER_TP_RULES):
    """Place a param tree onto the mesh according to the rules."""
    sh = tree_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def zero_spec(spec: P, shape: Tuple[int, ...], dp_size: int,
              dp_axis: str = "dp") -> P:
    """Extend a (TP) PartitionSpec with dp sharding on the first axis that is
    unsharded and divisible by the dp size. Indivisible/scalar leaves keep
    their spec — they stay replicated, exactly like DeepSpeed's untouched
    small states."""
    if not shape or dp_size <= 1:
        return spec
    parts = list(spec) + [None] * (len(shape) - len(spec))
    for i, (s, dim) in enumerate(zip(parts, shape)):
        if s is None and dim >= dp_size and dim % dp_size == 0:
            parts[i] = dp_axis
            return P(*parts)
    return spec


def zero_shardings(tree, mesh: Mesh,
                   rules: Sequence[Tuple[str, P]] = DECODER_TP_RULES,
                   dp_axis: str = "dp"):
    """ZeRO-1/2 shardings for an optimizer-state tree.

    Adam moments (and any other param-shaped leaf) are partitioned over dp in
    addition to the param's own TP spec; per-device optimizer memory drops
    ~dp-fold. Leaf paths inside optax states end with the param path
    (…/mu/decoder/…/q_proj/kernel), so the TP rules match unchanged.
    """
    dp_size = mesh.shape[dp_axis]

    def leaf(path, x):
        if getattr(x, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        spec = partition_spec_for(_path_str(path), rules)
        return NamedSharding(mesh, zero_spec(spec, x.shape, dp_size, dp_axis))

    return jax.tree_util.tree_map_with_path(leaf, tree)
