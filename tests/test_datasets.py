"""Dataset formatting + answer-mask tokenization tests (toy tokenizer)."""

import numpy as np

from infinite_video_tpu.data import datasets


class ToyTokenizer:
    """Whitespace tokenizer with a stable vocab; bos id 1."""

    def __init__(self):
        self.vocab = {"<s>": 1}

    def __call__(self, text, add_special_tokens=False):
        ids = []
        if add_special_tokens:
            ids.append(1)
        for w in text.split():
            if w not in self.vocab:
                self.vocab[w] = len(self.vocab) + 1
            ids.append(self.vocab[w])
        return {"input_ids": ids}


def test_mistral_conversation_format():
    qa = [{"i": "Watch carefully.", "q": "what happens?", "a": "a cat jumps"}]
    conv = datasets.mistral_conversation_text(
        qa, system="SYS ", instruction="Watch carefully.")
    assert conv.startswith("SYS Watch carefully. [INST] <Video></Video> [/INST]")
    assert "[INST] what happens? [/INST] a cat jumps </s>" in conv


def test_mistral_caption_turn_without_question():
    conv = datasets.mistral_conversation_text([{"q": "", "a": "a dog"}])
    assert "[INST] <Video></Video> [/INST] a dog </s>" in conv
    assert conv.count("[INST]") == 1


def test_vicuna_conversation_format():
    qa = [{"q": "q1?", "a": "a1"}, {"q": "q2?", "a": "a2"}]
    conv = datasets.vicuna_conversation_text(qa, system="SYS")
    assert conv.startswith("SYS###Human: <Video><ImageHere></Video>")
    assert "###Assistant: a1###" in conv
    assert "Human: q2?###Assistant: a2###" in conv


def test_tokenize_conversation_masks_only_answers():
    tok = ToyTokenizer()
    conv = "[INST] question one [/INST] answer alpha </s> [INST] two [/INST] beta </s>"
    ids, labels = datasets.tokenize_conversation(tok, conv)
    assert len(ids) == len(labels)
    unmasked = [int(i) for i, l in zip(ids, labels) if l != -100]
    # the unmasked ids must be exactly the answer spans (incl. </s>)
    ans_ids = tok("answer alpha </s>")["input_ids"] + tok("beta </s>")["input_ids"]
    assert unmasked == ans_ids
    # question tokens stay masked
    q_ids = set(tok("question one")["input_ids"])
    masked_ids = {int(i) for i, l in zip(ids, labels) if l == -100}
    assert q_ids <= masked_ids


def test_collate_it_batch_layout():
    from infinite_video_tpu.data.datasets import mistral_conversation_text
    from infinite_video_tpu.training.collate import (VIDEO_PLACEHOLDER,
                                                     collate_it_batch)

    tok = ToyTokenizer()
    conv = ("[INST] " + VIDEO_PLACEHOLDER +
            " [/INST] [INST] what? [/INST] an answer </s>")
    frames = np.zeros((2, 4, 4, 3), np.float32)
    batch = collate_it_batch([(frames, conv, "watch closely")], tok,
                             num_query_tokens=4)
    b, pre_len = batch["pre_ids"].shape
    assert batch["pixels"].shape == (1, 2, 4, 4, 3)
    assert batch["labels"].shape[1] == pre_len + 4 + batch["post_ids"].shape[1]
    # pre + query positions fully masked
    assert (batch["labels"][:, : pre_len + 4] == -100).all()
    # the answer tokens are unmasked somewhere in the post part
    assert (batch["labels"][:, pre_len + 4:] != -100).any()
    assert batch["instruction_mask"].sum() > 0
