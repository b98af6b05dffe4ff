"""LoRA adapters as a functional param-tree transform.

The reference wraps Mistral linears with peft LoRA (r=16, α=32, all
q/k/v/o/gate/up/down/lm_head — videochat2_it_mistral.py:149-158). Here LoRA
is a separate pytree of (A, B) factors over selected kernel paths plus a pure
`apply_lora` that produces effective weights W + (α/r)·A@B; the train step
differentiates w.r.t. the LoRA tree only, so the frozen base never gets
optimizer state (the ZeRO-friendly equivalent of peft's requires_grad
masking). `fold_lora` produces merged weights for inference.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["DEFAULT_TARGETS", "init_lora", "apply_lora", "fold_lora"]

# videochat2_it_mistral.py:152-156 target list.
DEFAULT_TARGETS = (r".*(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|"
                   r"down_proj|lm_head)/kernel$")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def init_lora(key: jax.Array, params: Dict, rank: int = 16,
              targets: str = DEFAULT_TARGETS) -> Dict:
    """LoRA tree mirroring `params`: {path: {"A": [in, r], "B": [r, out]}}.

    A ~ N(0, 0.02), B = 0 (standard LoRA init: adapters start as identity).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora = {}
    for i, (path, leaf) in enumerate(flat):
        p = _path_str(path)
        if re.match(targets, p) and leaf.ndim == 2:
            sub = jax.random.fold_in(key, i)
            lora[p] = {
                "A": jax.random.normal(sub, (leaf.shape[0], rank),
                                       jnp.float32) * 0.02,
                "B": jnp.zeros((rank, leaf.shape[1]), jnp.float32),
            }
    return lora


def apply_lora(params: Dict, lora: Dict, alpha: float = 32.0,
               rank: int = 16) -> Dict:
    """Effective params: kernel + (alpha/rank)·A@B on adapted paths."""
    scale = alpha / rank

    def fix(path, leaf):
        p = _path_str(path)
        if p in lora:
            delta = (lora[p]["A"] @ lora[p]["B"]) * scale
            return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, params)


def fold_lora(params: Dict, lora: Dict, alpha: float = 32.0,
              rank: int = 16) -> Dict:
    """Merge adapters permanently (inference-time weights)."""
    return apply_lora(params, lora, alpha, rank)
