"""torch → flax weight conversion for the Q-former.

Maps the reference/LAVIS `BertLMHeadModel` state_dict naming
(infty-Video-LLaMA/InfVideoLLaMA/models/Qformer.py) onto the
`infinite_video_tpu.models.qformer.QFormer` parameter tree. Works for all
three reference variants (frame/video/VC2 Q-former): keys absent from a
checkpoint (nulled word embeddings, cls head — infinityqa.py:115-120,204-209)
are simply skipped, and LTM entries are ignored (the LTM shares the discrete
projections and has no parameters of its own, Qformer.py:156-157).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

__all__ = ["convert_qformer_state_dict", "convert_lm_head_state_dict"]


def _set(tree: Dict, path, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(tree, prefix, torch_key, w):
    if torch_key.endswith(".weight"):
        _set(tree, prefix + ("kernel",), np.ascontiguousarray(w.T))
    else:
        _set(tree, prefix + ("bias",), w)


def _layernorm(tree, prefix, torch_key, w):
    name = "scale" if torch_key.endswith(".weight") else "bias"
    _set(tree, prefix + (name,), w)


def convert_qformer_state_dict(state_dict, unconsumed: list | None = None) -> Dict:
    """Returns a flax param dict for `QFormer` from a torch state_dict.

    Accepts tensors or numpy arrays; "bert." / "Qformer.bert." prefixes and
    LTM/position-id buffers are handled. `unconsumed` optionally collects
    source keys that mapped to no parameter (LTM buffers, position-id
    buffers, and cls-head keys — which convert_lm_head_state_dict owns — are
    intentional skips and excluded).
    """
    params: Dict = {}
    attn_inner = {"query": "query", "key": "key", "value": "value"}

    def note(key):
        if unconsumed is not None:
            unconsumed.append(key)

    for key, w in state_dict.items():
        w = np.asarray(getattr(w, "detach", lambda: w)().cpu().numpy()
                       if hasattr(w, "detach") else w, dtype=np.float32)
        k = key
        for pre in ("Qformer.", "bert."):
            if k.startswith(pre):
                k = k[len(pre):]
        if ("long_term_attention" in k or k.endswith("position_ids")
                or k.startswith("cls.")):
            continue

        if k.startswith("embeddings."):
            if "word_embeddings" in k:
                _set(params, ("word_embeddings", "embedding"), w)
            elif "position_embeddings" in k:
                _set(params, ("position_embeddings", "embedding"), w)
            elif "LayerNorm" in k:
                _layernorm(params, ("embeddings_ln",), k, w)
            else:
                note(key)
            continue

        m = re.match(r"encoder\.layer\.(\d+)\.(.+)", k)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            lp = (f"layer_{i}",)
            for attn_name in ("attention", "crossattention"):
                if rest.startswith(f"{attn_name}.self."):
                    sub = rest[len(f"{attn_name}.self."):].rsplit(".", 1)[0]
                    _linear(params, lp + (attn_name, attn_inner[sub]), rest, w)
                    break
                if rest.startswith(f"{attn_name}.output.dense"):
                    _linear(params, lp + (attn_name, "output_dense"), rest, w)
                    break
                if rest.startswith(f"{attn_name}.output.LayerNorm"):
                    _layernorm(params, lp + (attn_name, "output_ln"), rest, w)
                    break
            else:
                if rest.startswith("intermediate_query.dense"):
                    _linear(params, lp + ("ffn_query", "intermediate"), rest, w)
                elif rest.startswith("output_query.dense"):
                    _linear(params, lp + ("ffn_query", "output"), rest, w)
                elif rest.startswith("output_query.LayerNorm"):
                    _layernorm(params, lp + ("ffn_query", "ln"), rest, w)
                elif rest.startswith("intermediate.dense"):
                    _linear(params, lp + ("ffn", "intermediate"), rest, w)
                elif rest.startswith("output.dense"):
                    _linear(params, lp + ("ffn", "output"), rest, w)
                elif rest.startswith("output.LayerNorm"):
                    _layernorm(params, lp + ("ffn", "ln"), rest, w)
                else:
                    note(key)
            continue
        note(key)
    return params


def convert_lm_head_state_dict(state_dict) -> Dict:
    """cls.predictions.* → QFormerLMHead params."""
    params: Dict = {}
    for key, w in state_dict.items():
        w = np.asarray(getattr(w, "detach", lambda: w)().cpu().numpy()
                       if hasattr(w, "detach") else w, dtype=np.float32)
        k = key
        if k.startswith("Qformer."):
            k = k[len("Qformer."):]
        if not k.startswith("cls.predictions."):
            continue
        k = k[len("cls.predictions."):]
        if k.startswith("transform.dense"):
            _linear(params, ("transform_dense",), k, w)
        elif k.startswith("transform.LayerNorm"):
            _layernorm(params, ("transform_ln",), k, w)
        elif k.startswith("decoder.weight"):
            _set(params, ("decoder", "kernel"), np.ascontiguousarray(w.T))
        elif k == "bias" or k.startswith("decoder.bias"):
            _set(params, ("decoder", "bias"), w)
    return params
