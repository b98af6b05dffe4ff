"""Text↔video retrieval evaluation (ITC + ITM rescoring).

Port of infty-VideoChat2/tasks/retrieval_utils.py:18-460: similarity matrices
from the contrastive projections (with frame ensembling mean/max), top-k
candidate selection, optional ITM-head rescoring of the candidates, and
R@1/5/10 + median/mean rank reporting for both directions.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

__all__ = ["similarity_matrix", "itm_rescore", "retrieval_metrics",
           "evaluate_retrieval"]


def _normalize(x, axis=-1):
    return x / np.clip(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12, None)


def similarity_matrix(vision_proj: np.ndarray, text_proj: np.ndarray,
                      agg: str = "mean") -> np.ndarray:
    """vision [Nv, T, C] (or [Nv, C]), text [Nt, C] -> sim [Nv, Nt]."""
    v = _normalize(np.asarray(vision_proj, np.float32))
    t = _normalize(np.asarray(text_proj, np.float32))
    if v.ndim == 3:
        sim = np.einsum("mld,nd->mln", v, t)
        if agg == "mean":
            sim = sim.mean(1)
        elif agg == "max":
            sim = sim.max(1)
        elif agg == "lse":  # log-sum-exp frame ensembling (retrieval_utils.py)
            m = sim.max(1, keepdims=True)
            sim = (m + np.log(np.exp(sim - m).sum(1, keepdims=True)))[:, 0]
        else:
            raise ValueError(f"unknown agg: {agg}")
    else:
        sim = v @ t.T
    return sim


def itm_rescore(sim: np.ndarray, itm_score_fn: Callable[[int, int], float],
                k: int = 16) -> np.ndarray:
    """Rescore the top-k candidates of each row with the ITM match logit
    (retrieval_utils.py evaluation_wrapper pattern); returns sim + scores on
    the rescored entries, -inf elsewhere so ranking uses ITM among top-k."""
    out = np.full_like(sim, -np.inf)
    for i in range(sim.shape[0]):
        topk = np.argsort(sim[i])[::-1][:k]
        for j in topk:
            out[i, j] = sim[i, j] + itm_score_fn(i, int(j))
    return out


def retrieval_metrics(sim: np.ndarray, gt: Optional[np.ndarray] = None,
                      prefix: str = "") -> Dict[str, float]:
    """Ranks of the ground-truth column per row -> R@1/5/10, MedR, MeanR."""
    n = sim.shape[0]
    gt = np.arange(n) if gt is None else np.asarray(gt)
    ranks = np.empty(n)
    for i in range(n):
        order = np.argsort(sim[i])[::-1]
        ranks[i] = np.where(order == gt[i])[0][0]
    return {
        f"{prefix}r1": float(100.0 * (ranks < 1).mean()),
        f"{prefix}r5": float(100.0 * (ranks < 5).mean()),
        f"{prefix}r10": float(100.0 * (ranks < 10).mean()),
        f"{prefix}medr": float(np.median(ranks) + 1),
        f"{prefix}meanr": float(ranks.mean() + 1),
    }


def evaluate_retrieval(vision_proj, text_proj, *, agg: str = "mean",
                       itm_score_fn: Optional[Callable] = None,
                       itm_topk: int = 16) -> Dict[str, float]:
    sim_v2t = similarity_matrix(vision_proj, text_proj, agg)
    sim_t2v = sim_v2t.T
    if itm_score_fn is not None:
        sim_v2t = itm_rescore(sim_v2t, itm_score_fn, itm_topk)
        sim_t2v = itm_rescore(sim_t2v, lambda i, j: itm_score_fn(j, i), itm_topk)
    out = retrieval_metrics(sim_v2t, prefix="v2t_")
    out.update(retrieval_metrics(sim_t2v, prefix="t2v_"))
    out["r_mean"] = (out["v2t_r1"] + out["v2t_r5"] + out["v2t_r10"]
                     + out["t2v_r1"] + out["t2v_r5"] + out["t2v_r10"]) / 6
    return out
