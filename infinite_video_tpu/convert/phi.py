"""torch(HF) → flax conversion for the Phi decoder.

HF naming (PhiForCausalLM): model.embed_tokens, model.layers.{i}.
{input_layernorm, self_attn.{q,k,v}_proj, self_attn.dense, mlp.fc1, mlp.fc2},
model.final_layernorm, lm_head (all Linears with bias; LayerNorms with bias).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

__all__ = ["convert_phi_state_dict"]


def _np(w):
    return np.asarray(w.detach().cpu().float().numpy() if hasattr(w, "detach")
                      else w, dtype=np.float32)


def convert_phi_state_dict(state_dict) -> Dict:
    params: Dict = {}

    def put(path, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v

    def dense(prefix, key, w):
        if key.endswith("weight"):
            put(prefix + ("kernel",), np.ascontiguousarray(_np(w).T))
        else:
            put(prefix + ("bias",), _np(w))

    def layernorm(prefix, key, w):
        put(prefix + ("scale" if key.endswith("weight") else "bias",), _np(w))

    for key, w in state_dict.items():
        k = key
        for pre in ("phi_model.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k == "embed_tokens.weight":
            put(("embed_tokens", "embedding"), _np(w))
        elif k.startswith("final_layernorm."):
            layernorm(("final_ln",), k, w)
        elif k.startswith("lm_head."):
            dense(("lm_head",), k, w)
        else:
            m = re.match(r"layers\.(\d+)\.(.+)", k)
            if not m:
                continue
            i, rest = int(m.group(1)), m.group(2)
            lp = (f"layer_{i}",)
            if rest.startswith("input_layernorm."):
                layernorm(lp + ("input_ln",), rest, w)
            elif rest.startswith("self_attn.dense."):
                dense(lp + ("dense",), rest, w)
            else:
                m2 = re.match(r"(self_attn|mlp)\.(\w+)\.(weight|bias)", rest)
                if m2:
                    dense(lp + (m2.group(2),), rest, w)
    return params
