"""Benchmark eval drivers: NExT-QA, EgoSchema, Video-MME (± subtitles),
MovieChat-1K (global AND breakpoint modes), NExT-OE.

Each driver is a `run_*` function over a `LLaMAVideoQA`/`MistralVideoQA`
engine plus a frame source, with the reference's resumable predictions-JSON
protocol (eval/protocol.py). Dataset formats follow the reference loaders:
  - NExT-QA / EgoSchema multiple-choice CSV in IG-VLM layout
    (run_nextqa_mistral.py:490-534: columns [video, …, question@4, answer@5,
    qid@6, …, candidates 8:])
  - Video-MME JSON with per-question duration category and optional .vtt
    subtitles (run_videomme_mistral.py:84-127,214-226)
  - MovieChat-1K per-movie "global" QA JSON lists
    (run_inference_inf_video_llama_moviechat.py:226-254)

Frame sources are callables `video_name -> chunks [C, 1, T, H, W, 3]` so the
same driver runs from raw video (data/video_reader.py) or precomputed frame
tensors (the reference's .pt path, run_inference_inf_video_llama_nextqa.py:218-229).
"""

from __future__ import annotations

import csv
import json
import math
import os
import re
from typing import Callable, Dict, Iterable, List, Optional

from infinite_video_tpu.eval.metrics import (eval_qa_egoschema, eval_qa_nextqa,
                                             eval_qa_videomme)
from infinite_video_tpu.eval.protocol import PredictionStore

__all__ = ["load_igvlm_csv", "run_nextqa_mistral", "run_nextqa_llama",
           "run_egoschema", "run_videomme", "run_moviechat_global",
           "run_moviechat_breakpoint", "MC_SYSTEM_PROMPT",
           "check_answer_option"]

# run_nextqa_mistral.py:563-566
MC_SYSTEM_PROMPT = (
    "Carefully watch the video and pay attention to the cause and sequence of "
    "events, the detail and movement of objects, and the action and pose of "
    "persons. Based on your observations, select the best option that "
    "accurately addresses the question.\n"
)


def load_igvlm_csv(path: str) -> List[Dict]:
    """IG-VLM multiple-choice CSV -> [{video, qid, type, question, answer, …}].

    The header row is parsed to locate the NExT-QA question-type column (the
    reference's grouped accuracy reads it by name via pandas,
    run_nextqa_mistral.py:403); absent a type column (EgoSchema), type is ''.
    """
    out = []
    with open(path, encoding="utf-8") as f:
        reader = csv.reader(f)
        type_col = None
        for idx, msg in enumerate(reader):
            if idx == 0:
                header = [h.strip().lower() for h in msg]
                if "type" in header:
                    type_col = header.index("type")
                continue
            q = f"Question: {msg[4].capitalize()}\nOptions:\n"
            for i, cand in enumerate(msg[8:]):
                q += f"({chr(ord('A') + i)}) {cand}\n"
            target = int(msg[5])
            out.append({
                "video": msg[0] + ".mp4",
                "qid": f"{msg[0]}_{msg[6]}",
                "type": msg[type_col] if type_col is not None else "",
                "question": q.strip(),
                "answer": f"({chr(ord('A') + target)})",
                "answer_content": msg[8 + target],
            })
    return out


def check_answer_option(pred: str, answer: str, content: str) -> int:
    """Lenient option matching (run_nextqa_mistral.py:181-200)."""
    content = content.lower().rstrip(".")
    pl = pred.lower()
    if answer.lower() in pl:
        for kk in ["(a)", "(b)", "(c)", "(d)", "(e)"]:
            if kk != answer.lower() and kk in pl:
                return 0
        return 1
    if (content in pl or content.replace("a ", "") in pl
            or content.replace("an ", "") in pl):
        return 1
    return 0


def _engine_protocol(engine) -> str:
    """Declared engine wire protocol ("llama" | "mistral"); see
    eval/engine.py. Explicit attribute rather than hasattr duck-typing so a
    third engine cannot silently pick the wrong prompt assembly."""
    proto = getattr(engine, "protocol", None)
    if proto not in ("llama", "mistral"):
        raise TypeError(
            f"engine {type(engine).__name__} must declare protocol "
            f"'llama' or 'mistral', got {proto!r}")
    return proto


def _mc_question_loop(engine, samples, frame_source, store: PredictionStore,
                      *, system: str, question_prompt: str, answer_prompt: str,
                      return_prompt: str, progress: Optional[Callable] = None,
                      question_batch: int = 1):
    proto = _engine_protocol(engine)
    if question_batch > 1:
        _mc_question_loop_batched(engine, proto, samples, frame_source, store,
                                  system=system, question_prompt=question_prompt,
                                  answer_prompt=answer_prompt,
                                  return_prompt=return_prompt,
                                  progress=progress,
                                  question_batch=question_batch)
        return
    for i, s in enumerate(samples):
        if s["qid"] in store:
            continue
        chunks = frame_source(s["video"])
        if proto == "mistral":
            emb = engine.encode_video(chunks, system=system)
            pred = engine.answer(emb, s["question"], system=system,
                                 question_prompt=question_prompt,
                                 answer_prompt=answer_prompt,
                                 return_prompt=return_prompt)
        else:
            emb = engine.encode_video(chunks)
            pred = engine.answer(emb, s["question"] + question_prompt)
        store.record(s["qid"], {"answer": s["answer"], "pred": pred,
                                "content": s.get("answer_content", "")})
        if progress:
            progress(i, len(samples), s["qid"], pred)


def _mc_question_loop_batched(engine, proto, samples, frame_source, store,
                              *, system, question_prompt, answer_prompt,
                              return_prompt, progress, question_batch):
    """Throughput mode beyond the reference's sequential drivers: videos of a
    group batch through the streaming encode (chunk geometry is fixed per
    run) and answers decode together over left-padded prompts
    (engine.answer_batch). Groups are padded by repeating the last sample so
    one compiled shape serves the whole run; answers are identical to the
    sequential path (tested). The encode/answer calls branch on the same
    declared protocol as the sequential loop."""
    import numpy as np

    pending = [s for s in samples if s["qid"] not in store]
    done = 0
    for g in range(0, len(pending), question_batch):
        group = pending[g:g + question_batch]
        real = len(group)
        padded = group + [group[-1]] * (question_batch - real)
        chunks = np.concatenate([np.asarray(frame_source(s["video"]))
                                 for s in padded], axis=1)
        if proto == "mistral":
            embs = engine.encode_video(chunks, system=system)
            preds = engine.answer_batch(embs,
                                        [s["question"] for s in padded],
                                        system=system,
                                        question_prompt=question_prompt,
                                        answer_prompt=answer_prompt,
                                        return_prompt=return_prompt)
        else:
            embs = engine.encode_video(chunks)
            preds = engine.answer_batch(
                embs, [s["question"] + question_prompt for s in padded])
        for s, pred in zip(group, preds[:real]):
            store.record(s["qid"], {"answer": s["answer"], "pred": pred,
                                    "content": s.get("answer_content", "")})
            done += 1
            if progress:
                progress(done, len(pending), s["qid"], pred)


def _shard(samples, shard):
    """Multi-host sweep: host i of n handles samples[i::n] (replaces the
    reference's SLURM fan-out scripts); predictions merge by key."""
    if shard is None:
        return samples
    i, n = shard
    return samples[i::n]


def run_nextqa_mistral(engine, anno_csv: str, frame_source, out_path: str,
                       progress=None, shard=None, question_batch: int = 1) -> Dict:
    """∞-VideoChat2 NExT-QA MC protocol (run_nextqa_mistral.py:536-611)."""
    samples = _shard(load_igvlm_csv(anno_csv), shard)
    store = PredictionStore(out_path)
    _mc_question_loop(engine, samples, frame_source, store,
                      system=MC_SYSTEM_PROMPT,
                      question_prompt="\nOnly give the best option.",
                      answer_prompt="Best option:(", return_prompt="(",
                      progress=progress, question_batch=question_batch)
    rows = [{"video": s["qid"].rsplit("_", 1)[0], "qid": s["qid"].rsplit("_", 1)[1],
             "type": s.get("type") or "DO"} for s in samples]
    stats = eval_qa_nextqa(rows, store.data)
    store.finalize(stats)
    return stats


def run_nextqa_llama(engine, anno_csv: str, frame_source, out_path: str,
                     progress=None) -> Dict:
    """∞-Video-LLaMA NExT-QA open-ended protocol
    (run_inference_inf_video_llama_nextqa.py:253-280): record raw generations
    for the GPT-judge / option-matching stage."""
    store = PredictionStore(out_path)
    with open(anno_csv, encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    for i, row in enumerate(rows):
        key = f"{row['video']}_{row.get('qid', i)}"
        if key in store:
            continue
        chunks = frame_source(str(row["video"]))
        emb = engine.encode_video(chunks)
        pred = engine.answer(emb, row["question"])
        store.record(key, {"question": row["question"],
                           "answer": row.get("answer", ""), "pred": pred})
        if progress:
            progress(i, len(rows), key, pred)
    store.finalize()
    return store.data


def run_nextoe(engine, anno_csv: str, frame_source, out_path: str,
               progress=None, judge_chat_fn=None,
               judge_metric: str = "GEN") -> Dict:
    """Named NExT-OE driver (run_inference_inf_video_llama_nextoe.py): the
    open-ended generation protocol of `run_nextqa_llama` (no options passed
    to the prompt), then — when a judge chat function is supplied — the
    chained GPT-judge scoring stage (validate/run_eval_qa_chatgpt.py) over
    the prediction store, written next to the predictions as *.judged.json."""
    data = run_nextqa_llama(engine, anno_csv, frame_source, out_path, progress)
    if judge_chat_fn is None:
        return data
    from infinite_video_tpu.eval.judges import score_predictions

    verdict = score_predictions(data, judge_chat_fn, metric=judge_metric)
    judged_path = out_path.replace(".json", ".judged.json")
    with open(judged_path, "w", encoding="utf-8") as f:
        json.dump(verdict, f, indent=1)
    return {"preds": data, "judged_path": judged_path,
            "accuracy": verdict["accuracy"], "mean_score": verdict["mean_score"]}


def run_egoschema(engine, anno_csv: str, frame_source, out_path: str,
                  progress=None, shard=None, question_batch: int = 1) -> Dict:
    """EgoSchema MC; accuracy via exact-option matching; predictions JSON is
    also the official-server submission payload ({qid: option_index},
    validate/egoschema_acc.py:16-25)."""
    samples = _shard(load_igvlm_csv(anno_csv), shard)
    store = PredictionStore(out_path)
    _mc_question_loop(engine, samples, frame_source, store,
                      system=MC_SYSTEM_PROMPT,
                      question_prompt="\nOnly give the best option.",
                      answer_prompt="Best option:(", return_prompt="(",
                      progress=progress, question_batch=question_batch)
    data = {}
    for s in samples:
        rec = store.get(s["qid"])
        if rec is None:
            continue
        m = re.match(r"\((\w)\)", rec["pred"])
        data[s["qid"]] = {
            "answer": ord(s["answer"][1]) - ord("A"),
            "prediction": (ord(m.group(1).upper()) - ord("A")) if m else -1,
        }
    stats = eval_qa_egoschema(data)
    store.finalize(stats)
    return stats


def egoschema_submission(preds: Dict) -> Dict[str, int]:
    """{qid: predicted option index} for the validation server POST."""
    return {k: v["prediction"] for k, v in preds.items()
            if isinstance(v, dict) and "prediction" in v}


def read_vtt_subtitles(path: str, max_len: int = 4096,
                       token_len: Callable = len) -> str:
    """Concatenate .vtt cue text; if too long keep the head and tail halves
    (run_videomme_mistral.py:84-127)."""
    lines = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if (not line or line.startswith("WEBVTT") or "-->" in line
                    or line.isdigit()):
                continue
            lines.append(line)
    full = " ".join(lines)
    if token_len(full) <= max_len:
        return full
    half = len(lines) // 2
    while half > 1 and token_len(" ".join(lines[:half]) + " ".join(lines[-half:])) > max_len:
        half //= 2
    return " ".join(lines[:half]) + " " + " ".join(lines[-half:])


def run_videomme(engine, anno_json: str, frame_source, out_path: str, *,
                 subtitle_dir: Optional[str] = None, max_subtitle_len: int = 4096,
                 progress=None) -> Dict:
    """Video-MME MC with per-duration accuracy and optional subtitles."""
    with open(anno_json, encoding="utf-8") as f:
        samples = json.load(f)
    store = PredictionStore(out_path)
    for i, s in enumerate(samples):
        qid = str(s.get("question_id", i))
        if qid in store:
            continue
        sub = ""
        if subtitle_dir:
            vtt = os.path.join(subtitle_dir, s["videoID"] + ".vtt")
            if os.path.exists(vtt):
                sub = read_vtt_subtitles(vtt, max_subtitle_len)
        question = s["question"] + "\n" + "\n".join(s["options"])
        system = MC_SYSTEM_PROMPT
        if sub:
            system = f"Subtitles: {sub}\n" + system
        chunks = frame_source(s["videoID"])
        if _engine_protocol(engine) == "mistral":
            emb = engine.encode_video(chunks, system=system)
            pred = engine.answer(emb, question, system=system,
                                 question_prompt="\nOnly give the best option.",
                                 answer_prompt="Best option:(", return_prompt="(")
        else:
            emb = engine.encode_video(chunks)
            pred = engine.answer(emb, question)
        m = re.match(r"\((\w)\)", pred)
        store.record(qid, {
            "answer": s["answer"], "pred": pred,
            "prediction": m.group(1).upper() if m else -1,
            "duration": s.get("duration_category", s.get("duration", "unknown")),
        })
        if progress:
            progress(i, len(samples), qid, pred)
    stats = eval_qa_videomme(store.data)
    store.finalize(stats)
    return stats


def run_moviechat_global(engine, anno_dir: str, frame_source, out_path: str,
                         progress=None) -> Dict:
    """MovieChat-1K global mode: every movie has a JSON with a `global` QA
    list (run_inference_inf_video_llama_moviechat.py:226-254); answers are
    open-ended and scored downstream by the GPT judge."""
    store = PredictionStore(out_path)
    files = sorted(f for f in os.listdir(anno_dir) if f.endswith(".json"))
    for i, fname in enumerate(files):
        with open(os.path.join(anno_dir, fname), encoding="utf-8") as f:
            meta = json.load(f)
        video = meta.get("info", {}).get("video_path", fname.replace(".json", ".mp4"))
        chunks = None
        for j, qa in enumerate(meta.get("global", [])):
            key = f"{fname}_{j}"
            if key in store:
                continue
            if chunks is None:
                chunks = frame_source(video)
                emb = engine.encode_video(chunks)
            pred = engine.answer(emb, qa["question"])
            store.record(key, {"question": qa["question"],
                               "answer": qa.get("answer", ""), "pred": pred})
        if progress:
            progress(i, len(files), fname, "")
    store.finalize()
    return store.data


def run_moviechat_breakpoint(engine, anno_dir: str, frame_source,
                             out_path: str, progress=None) -> Dict:
    """MovieChat-1K breakpoint mode: each QA carries a `time` (frame index in
    the source video); the answer must come from the video prefix up to that
    moment only. The reference ships only the global-mode driver — this
    implements the benchmark's other half with the intended middle-video
    semantics of the (broken) reference demo (infinityqa.py:233-236,
    app_gradio.py breakpoint checkbox). The video encodes ONCE per movie
    (engine.encode_video_chunks, one static executable); each question's
    prefix mean over the per-chunk embeddings is a host-side masked mean —
    MovieChat-1K carries ~10 QAs per movie, so per-question re-encoding
    would cost ~10x the vision FLOPs. Works with both engine protocols.

    Annotation JSONs: {"info": {"video_path", "num_frame"},
    "breakpoint": [{"question", "answer", "time"}, ...]}.
    """
    import numpy as np

    store = PredictionStore(out_path)
    files = sorted(f for f in os.listdir(anno_dir) if f.endswith(".json"))
    for i, fname in enumerate(files):
        with open(os.path.join(anno_dir, fname), encoding="utf-8") as f:
            meta = json.load(f)
        info = meta.get("info", {})
        video = info.get("video_path", fname.replace(".json", ".mp4"))
        total = float(info.get("num_frame", 0)) or None
        chunk_embs = None
        for j, qa in enumerate(meta.get("breakpoint", [])):
            key = f"{fname}_bp{j}"
            if key in store:
                continue
            if chunk_embs is None:
                chunk_embs = np.asarray(
                    engine.encode_video_chunks(frame_source(video)),
                    np.float32)                       # [C, B, Q, D]
            n_chunks = int(chunk_embs.shape[0])
            t = float(qa.get("time", 0))
            frac = (t / total) if total else 1.0
            num_valid = max(1, min(n_chunks, int(math.ceil(frac * n_chunks))))
            emb = chunk_embs[:num_valid].mean(axis=0)
            pred = engine.answer(emb, qa["question"])
            store.record(key, {"question": qa["question"],
                               "answer": qa.get("answer", ""),
                               "time": t, "num_valid": num_valid,
                               "pred": pred})
        if progress:
            progress(i, len(files), fname, "")
    store.finalize()
    return store.data
