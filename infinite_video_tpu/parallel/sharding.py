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
Optimizer states inherit the same specs (≡ ZeRO along dp happens by sharding
the optimizer tree with `dp` instead; see training/trainer.py).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["DECODER_TP_RULES", "partition_spec_for", "tree_shardings",
           "shard_params"]

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
