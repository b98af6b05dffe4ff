"""FastChat delta-weight application (Vicuna = LLaMA + delta).

Port of infty-Video-LLaMA/apply_delta.py:12-40: the Vicuna release ships as a
delta over the base LLaMA weights; applying it is elementwise addition over
matching keys (the tokenizer-extended embedding rows of the delta are kept
as-is where shapes differ, matching FastChat's behaviour).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["apply_delta"]


def _np(x):
    return np.asarray(x.detach().cpu().float().numpy() if hasattr(x, "detach")
                      else x, dtype=np.float32)


def apply_delta(base_sd: Dict, delta_sd: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for key, delta in delta_sd.items():
        delta = _np(delta)
        if key not in base_sd:
            out[key] = delta
            continue
        base = _np(base_sd[key])
        if base.shape == delta.shape:
            out[key] = base + delta
        else:
            # vocab-extended rows: add over the overlap, keep delta's extras
            merged = delta.copy()
            sl = tuple(slice(0, min(b, d)) for b, d in zip(base.shape, delta.shape))
            merged[sl] = merged[sl] + base[sl]
            out[key] = merged
    return out
