"""External judges: GPT open-ended scoring, semantic option matching,
EgoSchema server submission.

Ports of the reference validation layer:
  - GPT-3.5 judge with six metric templates GEN/CI/DO/CU/TU/CO
    (eval_code/validate/utils.py:3-160, run_eval_qa_chatgpt.py:29-271).
    The default templates are byte-identical transcriptions of the
    reference's — including its typos ("{''score': 4.8}", double spaces) —
    because judged scores are only comparable to the paper's protocol under
    the exact prompt bytes. `judge_messages(..., exact=False)` selects the
    compact paraphrased rubrics instead (documented fallback).
  - Option matching: the reference maps open-ended predictions to the nearest
    MC option via OpenAI embeddings + Chroma (run_eval_langchain.py:56-70).
    Offline default: normalized token-overlap / difflib similarity; an
    `embed_fn` hook restores embedding-based matching.
  - EgoSchema official validation-server POST (validate/egoschema_acc.py:16-25).

All network use is gated: judges take a `chat_fn(messages) -> str` (any
OpenAI-compatible client) rather than importing an SDK.
"""

from __future__ import annotations

import ast
import difflib
import json
import re
from typing import Callable, Dict, List, Mapping, Optional, Sequence

__all__ = ["JUDGE_METRICS", "judge_messages", "parse_judge_reply",
           "score_predictions", "match_option", "bow_embed",
           "submit_egoschema"]

_RUBRICS = {
    "GEN": ("correctness of generative outputs",
            "meaningful match between the predicted answer and the correct "
            "answer, counting synonyms and paraphrases as valid",
            True),
    "CI": ("factual accuracy",
           "factual consistency with the correct answer, with no "
           "misinterpretations or misinformation", False),
    "DO": ("detail orientation",
           "completeness (covering all major points) and specificity "
           "(including precise details) of the prediction", False),
    "CU": ("contextual understanding",
           "alignment of the prediction with the overall context of the "
           "video content", False),
    "TU": ("temporal understanding",
           "accuracy of the order of events in the prediction", False),
    "CO": ("consistency",
           "consistency of the prediction across similar questions", False),
}

JUDGE_METRICS = tuple(_RUBRICS)


def _exact_templates() -> Dict[str, List[str]]:
    """Byte-identical judge prompt templates (eval_code/validate/utils.py:
    3-160), shipped as a JSON resource: [system, user-with-placeholders] per
    metric. Placeholders substitute via str.replace — the prompt bodies
    contain literal braces ({'pred': 'yes', ...})."""
    global _EXACT
    if _EXACT is None:
        import os

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "judge_templates.json")
        with open(path, encoding="utf-8") as f:
            _EXACT = json.load(f)
    return _EXACT


_EXACT = None


def judge_messages(metric: str, question: str, answer: str, pred: str,
                   exact: bool = True) -> List[Dict]:
    """OpenAI-style chat messages for one QA pair under one metric rubric.

    exact=True (default): the reference's prompt bytes — judged scores are
    comparable to the paper's protocol. exact=False: compact paraphrases."""
    if exact:
        sys_c, usr_t = _exact_templates()[metric]
        usr_c = (usr_t.replace("{question}", question)
                 .replace("{answer}", answer).replace("{pred}", pred))
        return [{"role": "system", "content": sys_c},
                {"role": "user", "content": usr_c}]
    topic, focus, want_pred = _RUBRICS[metric]
    sys = (
        f"You are an intelligent chatbot designed for evaluating the {topic} "
        "of video-based question-answer pairs. Your task is to compare the "
        f"predicted answer with the correct answer, focusing on the {focus}."
    )
    ask = (
        "Please evaluate the following video-based question-answer pair:\n\n"
        f"Question: {question}\nCorrect Answer: {answer}\n"
        f"Predicted Answer: {pred}\n\n"
    )
    if want_pred:
        ask += (
            "Provide your evaluation as a yes/no plus an integer score from 0 "
            "to 5 (5 = highest match). Respond ONLY with a Python dictionary "
            "string with keys 'pred' ('yes' or 'no') and 'score' (integer), "
            "e.g. {'pred': 'yes', 'score': 4}."
        )
    else:
        ask += (
            "Provide your evaluation as an integer score from 0 to 5 (5 = "
            "best). Respond ONLY with a Python dictionary string with the "
            "key 'score' (integer), e.g. {'score': 4}."
        )
    return [{"role": "system", "content": sys},
            {"role": "user", "content": ask}]


def parse_judge_reply(reply: str) -> Dict:
    """Parse the judge's dict-literal reply (run_eval_qa_chatgpt.py uses
    ast.literal_eval on the raw content)."""
    m = re.search(r"\{.*\}", reply, re.DOTALL)
    if not m:
        return {"score": 0}
    try:
        out = ast.literal_eval(m.group(0))
        return out if isinstance(out, dict) else {"score": 0}
    except (ValueError, SyntaxError):
        return {"score": 0}


def score_predictions(preds: Mapping[str, Mapping], chat_fn: Callable,
                      metric: str = "GEN") -> Dict:
    """Run the judge over {key: {question, answer, pred}}; returns per-key
    verdicts plus aggregate accuracy / mean score."""
    results, yes, total, score_sum = {}, 0, 0, 0.0
    for key, qa in preds.items():
        if not isinstance(qa, dict) or "pred" not in qa:
            continue
        reply = chat_fn(judge_messages(metric, qa.get("question", ""),
                                       qa.get("answer", ""), qa["pred"]))
        verdict = parse_judge_reply(reply)
        results[key] = verdict
        total += 1
        score_sum += float(verdict.get("score", 0))
        if str(verdict.get("pred", "")).lower() == "yes":
            yes += 1
    return {
        "results": results,
        "accuracy": yes / total if total else 0.0,
        "mean_score": score_sum / total if total else 0.0,
    }


def _similarity(a: str, b: str) -> float:
    return difflib.SequenceMatcher(None, a.lower().strip(), b.lower().strip()).ratio()


def match_option(prediction: str, options: Sequence[str],
                 embed_fn: Optional[Callable] = None) -> int:
    """Nearest option index for an open-ended prediction.

    With `embed_fn` (texts -> vectors): cosine nearest-neighbour, matching the
    reference's semantic selector; otherwise difflib string similarity."""
    if embed_fn is not None:
        import numpy as np

        vecs = np.asarray(embed_fn([prediction] + list(options)))
        p, opts = vecs[0], vecs[1:]
        sims = opts @ p / (np.linalg.norm(opts, axis=1) * np.linalg.norm(p) + 1e-9)
        return int(sims.argmax())
    scores = [_similarity(prediction, o) for o in options]
    return int(max(range(len(options)), key=scores.__getitem__))


def bow_embed(texts: Sequence[str]):
    """Reference `embed_fn` implementation: bag-of-words count vectors over
    the batch vocabulary. Offline stand-in for the OpenAI-embedding selector
    (run_eval_langchain.py:56-70) — semantic word overlap rather than
    character-sequence similarity. Plug a real embedding client into
    `match_option(embed_fn=...)` for paper-protocol matching."""
    import numpy as np

    tokens = [re.findall(r"[a-z0-9']+", t.lower()) for t in texts]
    vocab = {w: i for i, w in enumerate(sorted({w for ts in tokens for w in ts}))}
    out = np.zeros((len(texts), max(len(vocab), 1)), np.float32)
    for r, ts in enumerate(tokens):
        for w in ts:
            out[r, vocab[w]] += 1.0
    return out


def submit_egoschema(predictions: Dict[str, int], url: str =
                     "https://validation-server.onrender.com/api/upload/"):
    """POST {qid: option_index} to the official EgoSchema validation server."""
    import requests

    headers = {"Content-Type": "application/json"}
    resp = requests.post(url, headers=headers, data=json.dumps(predictions))
    return resp.json()
