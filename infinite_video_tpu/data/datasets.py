"""Instruction/caption dataset formatting + answer-masked tokenization.

Ports the reference's per-LLM prompt dialects and label masking:
  - Mistral instruct (infty-VideoChat2/dataset/it_dataset_mistral.py:80-105):
    "{system}{instr}[INST] <Video></Video>{msg} [/INST] [INST] q [/INST] a</s>"
  - Vicuna "###" dialect (InfVideoLLaMA/datasets/datasets/
    video_instruct_dataset.py:139-230 and it_dataset.py): "###Human: q###Assistant: a"
  - Plain caption pairs for the webvid/cc_sbu-style pretraining corpora.

`tokenize_conversation` builds (input_ids, labels) with -100 everywhere except
assistant answers — the loss masking of videochat2_it_mistral.py:258-352.
Dataset classes are thin JSON-annotation wrappers yielding
(frames, conversation, instruction) with `num_tries` fault tolerance; media
decoding goes through data/video_reader.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from infinite_video_tpu.data.loader import retrying
from infinite_video_tpu.data.video_reader import read_video_frames

__all__ = ["mistral_conversation_text", "vicuna_conversation_text",
           "phi_conversation_text", "tokenize_conversation",
           "InstructionDataset", "CaptionDataset", "ANSWER_PATTERNS"]


def mistral_conversation_text(qa: Sequence[Dict], *, system: str = "",
                              instruction: str = "", media_tokens: str = "<Video></Video>",
                              msg: str = "") -> str:
    conv = system
    if instruction:
        conv += instruction if instruction.endswith(" ") else instruction + " "
    conv += "[INST] " + media_tokens + msg.rstrip() + " [/INST]"
    for turn in qa:
        q, a = turn.get("q", ""), turn["a"]
        if q:
            conv += " [INST] " + q + " [/INST]"
        conv += " " + a + " </s>"
    return conv.strip()


def vicuna_conversation_text(qa: Sequence[Dict], *, system: str = "",
                             media_tokens: str = "<Video><ImageHere></Video>",
                             msg: str = "") -> str:
    conv = system + "###"
    first = True
    for turn in qa:
        q, a = turn.get("q", ""), turn["a"]
        human = ("Human: " + (media_tokens + " " + msg + " " if first else "") + q)
        conv += human + "###" + "Assistant: " + a + "###"
        first = False
    return conv


def phi_conversation_text(qa: Sequence[Dict], *, system: str = "",
                          instruction: str = "",
                          media_tokens: str = "<Video></Video>",
                          msg: str = "") -> str:
    """Phi-3 chat dialect (infty-VideoChat2/dataset/it_dataset_phi.py:42-103):
    optional "<|system|>\\n...<|end|>\\n" header (system + per-sample
    instruction), then "<|user|>\\n q <|end|>\\n<|assistant|>\\n a <|end|>\\n"
    turns; the media tokens lead the first user turn."""
    human_start, human_end, assist_end = (
        "<|user|>\n", "<|end|>\n<|assistant|>\n", "<|end|>\n")
    header = system
    if instruction:
        header += instruction
    conv = f"<|system|>\n{header}<|end|>\n" if header else ""
    for idx, turn in enumerate(qa):
        q, a = turn.get("q", ""), turn["a"]
        if idx == 0:
            lead = media_tokens + msg.rstrip() + "\n"
            conv += human_start + lead + (q.strip() + human_end if q
                                          else human_end)
        else:
            conv += human_start + q.strip() + human_end
        conv += a.strip() + assist_end
    return conv.strip()


# dialect -> (answer open tag, answer close tag) for tokenize_conversation
ANSWER_PATTERNS = {
    "mistral": ("[/INST]", "</s>"),
    "vicuna": ("Assistant: ", "###"),
    "phi": ("<|assistant|>\n", "<|end|>\n"),
}


def tokenize_conversation(tokenizer, conversation: str, *,
                          assistant_pattern: Tuple[str, str] = ("[/INST]", "</s>"),
                          max_len: int = 512) -> Tuple[np.ndarray, np.ndarray]:
    """(input_ids, labels): labels are -100 outside assistant answers.

    Mirrors the reference's span accounting, which measures per-segment token
    lengths and unmasks only answer spans (videochat2_it_mistral.py:258-352).
    """
    open_tag, close_tag = assistant_pattern
    full_ids = tokenizer(conversation, add_special_tokens=True)["input_ids"]
    ids = full_ids[:max_len]
    labels = np.full(len(ids), -100, np.int64)

    # walk the text, mapping answer character spans to token spans
    pos = 0
    spans = []
    while True:
        start = conversation.find(open_tag, pos)
        if start < 0:
            break
        ans_start = start + len(open_tag)
        ans_end = conversation.find(close_tag, ans_start)
        if ans_end < 0:
            ans_end = len(conversation)
        spans.append((ans_start, ans_end + len(close_tag)))
        pos = ans_end + len(close_tag)

    def tok_len(text):
        return len(tokenizer(text, add_special_tokens=False)["input_ids"])

    # BOS offset from the UNtruncated length — spans past max_len are clipped
    # below, but earlier spans must not shift when the tail is cut off.
    bos = len(full_ids) - tok_len(conversation)
    for cs, ce in spans:
        ts = bos + tok_len(conversation[:cs])
        te = bos + tok_len(conversation[:ce])
        labels[max(ts, 0):min(te, len(ids))] = ids[max(ts, 0):min(te, len(ids))]
    return np.asarray(ids, np.int64), labels


@dataclasses.dataclass
class InstructionDataset:
    """JSON-annotated instruction tuning data -> (frames, conversation, instruction).

    ann format (reference it datasets): [{"video"|"image": path,
    "qa": [{"i": instr, "q": question, "a": answer}, ...]}].
    """

    ann_file: str
    data_root: str
    processor: Callable
    num_frames: int = 8
    dialect: str = "mistral"          # "mistral" | "vicuna" | "phi"
    system: str = ""
    random_shuffle: bool = True
    num_tries: int = 3
    media_type: str = "video"

    def __post_init__(self):
        with open(self.ann_file) as f:
            self.anno = json.load(f)
        self._fetch = retrying(self._get, self.num_tries,
                               dataset_len=len(self.anno))

    def __len__(self):
        return len(self.anno)

    def _get(self, index: int):
        ann = self.anno[index]
        path = os.path.join(self.data_root, ann.get("video", ann.get("image")))
        frames = read_video_frames(path, self.num_frames)
        frames = self.processor(frames)
        qa = list(ann["qa"])
        if self.random_shuffle and len(qa) > 1:
            random.shuffle(qa)
        instruction = (qa[0].get("i", "") or "").strip()
        if self.dialect == "mistral":
            conv = mistral_conversation_text(qa, system=self.system,
                                             instruction=instruction)
        elif self.dialect == "phi":
            conv = phi_conversation_text(qa, system=self.system,
                                         instruction=instruction)
        else:
            conv = vicuna_conversation_text(qa, system=self.system)
        return frames, conv, instruction

    def __getitem__(self, index: int):
        return self._fetch(index)


@dataclasses.dataclass
class CaptionDataset:
    """Video/image-caption pairs (webvid / cc_sbu style builders,
    InfVideoLLaMA/datasets/builders)."""

    ann_file: str
    data_root: str
    processor: Callable
    num_frames: int = 8
    num_tries: int = 3

    def __post_init__(self):
        with open(self.ann_file) as f:
            self.anno = json.load(f)
        self._fetch = retrying(self._get, self.num_tries,
                               dataset_len=len(self.anno))

    def __len__(self):
        return len(self.anno)

    def _get(self, index: int):
        ann = self.anno[index]
        path = os.path.join(self.data_root, ann.get("video", ann.get("image")))
        frames = self.processor(read_video_frames(path, self.num_frames))
        return frames, ann["caption"]

    def __getitem__(self, index: int):
        return self._fetch(index)
