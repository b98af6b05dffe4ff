"""Benchmark accuracy aggregators.

Ports of the reference metric definitions:
  - NExT-QA grouped accuracy over C/T/D question families
    (infty-VideoChat2/eval_code/run_nextqa_mistral.py:394-455, itself adapted
    from doc-doc/NExT-QA eval_mc.py)
  - Video-MME per-duration accuracy (eval_code/validate/run_eval.py:16-56)
  - EgoSchema exact-option accuracy (run_eval.py:63-80)
"""

from __future__ import annotations

import csv
import json
from typing import Dict, Iterable, Mapping

__all__ = ["eval_qa_nextqa", "eval_qa_videomme", "eval_qa_egoschema"]

_NEXTQA_TYPES = ("CW", "CH", "TN", "TC", "DC", "DL", "DO")


def eval_qa_nextqa(rows: Iterable[Mapping], preds: Mapping[str, Mapping]) -> Dict:
    """Grouped accuracy. `rows` are annotation dicts with video/qid/type;
    `preds` maps "video_qid" -> {"answer": str, "pred": str}. A prediction is
    correct when the ground truth equals pred[:3] (the "(X)" option prefix)."""
    group = {t: [] for t in _NEXTQA_TYPES}
    for row in rows:
        qns_id = f"{row['video']}_{row['qid']}"
        if qns_id not in preds:
            continue
        qtype = str(row["type"])
        if qtype == "TP":  # combine previous/next temporal questions as TN
            qtype = "TN"
        group[qtype].append(qns_id)

    group_acc = {t: 0 for t in _NEXTQA_TYPES}
    group_cnt = {t: 0 for t in _NEXTQA_TYPES}
    overall_acc = {"C": 0, "T": 0, "D": 0}
    overall_cnt = {"C": 0, "T": 0, "D": 0}
    all_acc = all_cnt = 0
    for qtype, qns_ids in group.items():
        for qid in qns_ids:
            correct = int(preds[qid]["answer"] == preds[qid]["pred"][:3])
            group_cnt[qtype] += 1
            group_acc[qtype] += correct
            overall_acc[qtype[0]] += correct
            overall_cnt[qtype[0]] += 1
            all_acc += correct
            all_cnt += 1

    stat = {}
    for qtype in _NEXTQA_TYPES:
        stat[qtype] = (group_acc[qtype] * 100.0 / group_cnt[qtype]
                       if group_cnt[qtype] else 0.0)
    for fam in ("C", "T", "D"):
        stat[fam] = (overall_acc[fam] * 100.0 / overall_cnt[fam]
                     if overall_cnt[fam] else 0.0)
    stat["Acc"] = all_acc * 100.0 / all_cnt if all_cnt else 0.0
    return stat


def eval_qa_nextqa_csv(anno_csv: str, preds_json: str) -> Dict:
    with open(preds_json) as f:
        preds = json.load(f)
    preds.pop("stats", None)
    with open(anno_csv) as f:
        rows = list(csv.DictReader(f))
    return eval_qa_nextqa(rows, preds)


def eval_qa_videomme(data: Mapping[str, Mapping]) -> Dict:
    """Per-duration-category accuracy; prediction == -1 counts as invalid."""
    num_valids = num_corrects = 0
    per = {}
    for _, el in data.items():
        d = el["duration"]
        per.setdefault(d, {"valids": 0, "corrects": 0})
        if el["prediction"] == -1:
            continue
        num_valids += 1
        per[d]["valids"] += 1
        if el["answer"] == el["prediction"]:
            num_corrects += 1
            per[d]["corrects"] += 1
    return {
        "num_total": len(data),
        "num_valids": num_valids,
        "num_corrects": num_corrects,
        "overall_acc": num_corrects / len(data) if data else 0.0,
        "category_accuracies": {
            d: (c["corrects"] / c["valids"] if c["valids"] else 0.0)
            for d, c in per.items()
        },
    }


def eval_qa_egoschema(data: Mapping[str, Mapping]) -> Dict:
    num_valids = num_corrects = 0
    for _, el in data.items():
        if el["prediction"] == -1:
            continue
        num_valids += 1
        if el["answer"] == el["prediction"]:
            num_corrects += 1
    return {
        "num_total": len(data),
        "num_valids": num_valids,
        "num_corrects": num_corrects,
        "acc": num_corrects / len(data) if data else 0.0,
    }
