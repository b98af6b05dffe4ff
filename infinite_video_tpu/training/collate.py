"""Batch collation for instruction tuning: samples → the train-step dict.

Bridges data/datasets.py samples (frames, conversation, instruction) to
training/trainer.it_loss's batch format: the conversation is split at the
video placeholder, both sides tokenized, answer spans label-unmasked
(tokenize_conversation), and the label row assembled as
[-100 × pre] [-100 × video query tokens] [post labels], right-padded across
the batch — the splice layout of videochat2_it_mistral.py:258-352.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from infinite_video_tpu.data.datasets import ANSWER_PATTERNS, tokenize_conversation

__all__ = ["collate_it_batch", "collate_pt_batch", "collate_qformer_batch",
           "collate_hd_batch", "VIDEO_PLACEHOLDER"]

VIDEO_PLACEHOLDER = "<Video></Video>"


def _pad_rows(rows: List[np.ndarray], pad_value: int) -> np.ndarray:
    width = max(len(r) for r in rows)
    out = np.full((len(rows), width), pad_value, dtype=np.int64)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def _collate_text_parts(
    samples: Sequence[Tuple],
    tokenizer,
    num_query_tokens: int,
    qformer_tokenizer=None,
    max_len: int = 512,
    pad_token_id: int = 0,
    dialect: str = "mistral",
) -> Dict[str, np.ndarray]:
    """Shared IT text collation: conversation split at the video placeholder,
    answer spans label-unmasked, label row [-100×pre][-100×video][post].
    `dialect` selects the answer-span delimiters (ANSWER_PATTERNS)."""
    qformer_tokenizer = qformer_tokenizer or tokenizer
    answer_pattern = ANSWER_PATTERNS[dialect]
    pre_rows, post_rows, post_label_rows, instr_rows = [], [], [], []
    for _frames, conversation, instruction in samples:
        if VIDEO_PLACEHOLDER in conversation:
            pre_text, post_text = conversation.split(VIDEO_PLACEHOLDER, 1)
        else:
            pre_text, post_text = "", conversation
        pre_ids = np.asarray(
            tokenizer(pre_text, add_special_tokens=True)["input_ids"], np.int64)
        post_ids, post_labels = tokenize_conversation(
            tokenizer, post_text, assistant_pattern=answer_pattern,
            max_len=max_len)
        # tokenize_conversation adds special tokens; drop a leading BOS on the
        # post side (the sequence continues mid-prompt after the video).
        if len(post_ids) and post_ids[0] == getattr(tokenizer, "bos_token_id", 1):
            post_ids, post_labels = post_ids[1:], post_labels[1:]
        pre_rows.append(pre_ids)
        post_rows.append(np.asarray(post_ids, np.int64))
        post_label_rows.append(np.asarray(post_labels, np.int64))
        instr_rows.append(np.asarray(
            qformer_tokenizer(instruction or "",
                              add_special_tokens=True)["input_ids"], np.int64))

    pre = _pad_rows(pre_rows, pad_token_id)
    post = _pad_rows(post_rows, pad_token_id)
    post_labels = _pad_rows(post_label_rows, -100)
    instr = _pad_rows(instr_rows, pad_token_id)
    instr_mask = (instr != pad_token_id).astype(np.float32)

    b = len(samples)
    labels = np.concatenate([
        np.full((b, pre.shape[1] + num_query_tokens), -100, np.int64),
        post_labels,
    ], axis=1)
    pre_mask = np.zeros(pre.shape, np.float32)
    for i, r in enumerate(pre_rows):
        pre_mask[i, : len(r)] = 1.0
    post_mask = np.zeros(post.shape, np.float32)
    for i, r in enumerate(post_rows):
        post_mask[i, : len(r)] = 1.0
    return {
        "instruction_ids": instr,
        "instruction_mask": instr_mask,
        "pre_ids": pre,
        "post_ids": post,
        "pre_mask": pre_mask,
        "post_mask": post_mask,
        "labels": labels,
    }


def collate_it_batch(
    samples: Sequence[Tuple],
    tokenizer,
    num_query_tokens: int,
    qformer_tokenizer=None,
    max_len: int = 512,
    pad_token_id: int = 0,
    dialect: str = "mistral",
) -> Dict[str, np.ndarray]:
    """samples: [(frames [T,H,W,3], conversation, instruction), ...] ->
    {pixels, instruction_ids, instruction_mask, pre_ids, post_ids, labels}."""
    out = _collate_text_parts(samples, tokenizer, num_query_tokens,
                              qformer_tokenizer, max_len, pad_token_id, dialect)
    out["pixels"] = np.stack([s[0] for s in samples])
    return out


def collate_pt_batch(
    samples: Sequence[Tuple],
    tokenizer,
    num_query_tokens: int,
    prompt: str = VIDEO_PLACEHOLDER,
    end_sym: str = "</s>",
    max_len: int = 512,
    pad_token_id: int = 0,
) -> Dict[str, np.ndarray]:
    """Stage-2 vision-text pretraining batch (videochat2_pt_mistral.py:211-257):
    [BOS + prompt-before-video] [video query tokens] [prompt-after-video +
    caption + end_sym], loss on the caption span only (prompt and padding are
    -100; the reference masks everything up to and including the wrapped
    prompt, :241-245).

    samples: [(frames [T,H,W,3], caption), ...] — CaptionDataset output.
    """
    if VIDEO_PLACEHOLDER in prompt:
        pre_text, post_prompt = prompt.split(VIDEO_PLACEHOLDER, 1)
    else:
        pre_text, post_prompt = "", prompt
    bos = getattr(tokenizer, "bos_token_id", 1)

    pixels, pre_rows, post_rows, label_rows = [], [], [], []
    for frames, caption in samples:
        pixels.append(frames)
        pre_ids = [bos] + list(
            tokenizer(pre_text, add_special_tokens=False)["input_ids"])
        suffix_ids = list(
            tokenizer(post_prompt, add_special_tokens=False)["input_ids"])
        cap_ids = list(tokenizer(caption + end_sym,
                                 add_special_tokens=False)["input_ids"])
        cap_ids = cap_ids[: max_len]
        pre_rows.append(np.asarray(pre_ids, np.int64))
        post_rows.append(np.asarray(suffix_ids + cap_ids, np.int64))
        label_rows.append(np.asarray([-100] * len(suffix_ids) + cap_ids,
                                     np.int64))

    pre = _pad_rows(pre_rows, pad_token_id)
    post = _pad_rows(post_rows, pad_token_id)
    post_labels = _pad_rows(label_rows, -100)
    b = len(samples)
    labels = np.concatenate([
        np.full((b, pre.shape[1] + num_query_tokens), -100, np.int64),
        post_labels,
    ], axis=1)
    pre_mask = np.zeros(pre.shape, np.float32)
    post_mask = np.zeros(post.shape, np.float32)
    for i, (pr, po) in enumerate(zip(pre_rows, post_rows)):
        pre_mask[i, : len(pr)] = 1.0
        post_mask[i, : len(po)] = 1.0
    return {"pixels": np.stack(pixels), "pre_ids": pre, "post_ids": post,
            "pre_mask": pre_mask, "post_mask": post_mask, "labels": labels}


def collate_qformer_batch(
    samples: Sequence[Tuple],
    tokenizer,
    max_txt_len: int = 32,
    pad_token_id: int = 0,
) -> Dict[str, np.ndarray]:
    """Stage-1 Q-former contrastive pretraining batch (train_qformer.py:
    image/caption pairs tokenized by the BERT-side tokenizer, max_txt_l=32):
    {pixels [B,T,H,W,C], text_ids, text_mask, idx}. `idx` carries the sample
    identity so repeated captions become soft positives in the VTC/VTM
    targets (criterions.py get_sim idx semantics).

    samples: [(frames [T,H,W,3], caption), ...] or
             [(frames, caption, idx), ...] — CaptionDataset output.
    """
    pixels, rows, idxs = [], [], []
    for i, sample in enumerate(samples):
        frames, caption = sample[0], sample[1]
        pixels.append(frames)
        ids = list(tokenizer(caption, add_special_tokens=True)["input_ids"])
        if len(ids) > max_txt_len:
            # HF truncation semantics: content is cut, the trailing special
            # token ([SEP]) is kept as the final token
            ids = ids[: max_txt_len - 1] + [ids[-1]]
        rows.append(np.asarray(ids, np.int64))
        idxs.append(sample[2] if len(sample) > 2 else i)
    text_ids = _pad_rows(rows, pad_token_id)
    text_mask = (text_ids != pad_token_id).astype(np.float32)
    # a genuine pad id inside a caption (position 0 is CLS/BOS) stays visible
    text_mask[:, 0] = 1.0
    return {"pixels": np.stack(pixels), "text_ids": text_ids,
            "text_mask": text_mask, "idx": np.asarray(idxs, np.int64)}


def collate_hd_batch(
    samples: Sequence[Tuple],
    tokenizer,
    num_query_tokens: int,
    hd_num: int = 6,
    image_size: int = 224,
    add_global: bool = True,
    use_padding: bool = True,
    mean: Tuple = (0.48145466, 0.4578275, 0.40821073),
    std: Tuple = (0.26862954, 0.26130258, 0.27577711),
    qformer_tokenizer=None,
    max_len: int = 512,
    pad_token_id: int = 0,
) -> Dict[str, np.ndarray]:
    """HD stage-4 batch (videochat2_it_hd_mistral.py): each sample's frames
    go through the dynamic-resolution HD transform (data/hd_utils.py), are
    cut into 224px tiles (+ a global thumbnail), normalised, and padded to a
    FIXED max_tiles = hd_num(+1) — the TPU static-shape choice; `tile_mask`
    marks real tiles. The decoder sees max_tiles*Q video positions with
    padded tiles masked out of attention and labels.

    samples: [(frames [T, H, W, 3] uint8 or float01 at ORIGINAL aspect,
               conversation, instruction), ...] — use a raw (non-resizing)
    processor upstream.
    """
    from infinite_video_tpu.data.hd_utils import tile_stack

    max_tiles = hd_num + (1 if add_global else 0)
    out = _collate_text_parts(samples, tokenizer, max_tiles * num_query_tokens,
                              qformer_tokenizer, max_len, pad_token_id)

    s = image_size
    pixel_rows, mask_rows = [], []
    for frames, _conv, _instr in samples:
        tiles = tile_stack(frames, s, hd_num, add_global=add_global,
                           use_padding=use_padding, mean=mean, std=std)
        n, t = tiles.shape[0], tiles.shape[1]
        assert n <= max_tiles, (n, max_tiles)
        padded = np.zeros((max_tiles, t, s, s, tiles.shape[-1]), np.float32)
        padded[:n] = tiles
        pixel_rows.append(padded)
        mask_rows.append([1.0] * n + [0.0] * (max_tiles - n))

    out["pixels"] = np.stack(pixel_rows)                # [B, M, T, s, s, C]
    out["tile_mask"] = np.asarray(mask_rows, np.float32)
    # pre_mask/post_mask come from _collate_text_parts (exact row lengths)
    return out
