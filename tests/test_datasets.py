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


def test_phi_conversation_format():
    """it_dataset_phi.py:42-103: <|system|>/<|user|>/<|assistant|> tags with
    <|end|> turn terminators; media tokens lead the first user turn."""
    qa = [{"i": "inst ", "q": "q1?", "a": "a1"}, {"q": "q2?", "a": "a2"}]
    conv = datasets.phi_conversation_text(qa, system="SYS ",
                                          instruction="inst ")
    assert conv.startswith("<|system|>\nSYS inst <|end|>\n<|user|>\n")
    assert "<Video></Video>\nq1?<|end|>\n<|assistant|>\na1<|end|>\n" in conv
    assert "<|user|>\nq2?<|end|>\n<|assistant|>\na2<|end|>" in conv
    # captions: no question -> media tokens alone in the user turn
    cap = datasets.phi_conversation_text([{"q": "", "a": "cap"}])
    assert "<|user|>\n<Video></Video>\n<|end|>\n<|assistant|>\ncap<|end|>" in cap


def test_tokenize_conversation_phi_masks_only_answers():
    tok = ToyTokenizer()
    qa = [{"q": "what is it ?", "a": "alpha beta"},
          {"q": "again ?", "a": "gamma"}]
    conv = datasets.phi_conversation_text(qa, system="SYS ")
    ids, labels = datasets.tokenize_conversation(
        tok, conv, assistant_pattern=datasets.ANSWER_PATTERNS["phi"])
    unmasked = [int(i) for i, l in zip(ids, labels) if l != -100]
    # the whitespace ToyTokenizer merges "beta<|end|>" into one token; the
    # answer spans tokenize in-context exactly as these substrings do
    ans_ids = (tok("alpha beta<|end|>")["input_ids"] +
               tok("gamma<|end|>")["input_ids"])
    assert unmasked == ans_ids
    q_ids = set(tok("what is it again")["input_ids"])
    masked_ids = {int(i) for i, l in zip(ids, labels) if l == -100}
    assert q_ids <= masked_ids


def test_tokenize_conversation_vicuna_masks_only_answers():
    tok = ToyTokenizer()
    qa = [{"q": "one ?", "a": "alpha"}, {"q": "two ?", "a": "beta"}]
    conv = datasets.vicuna_conversation_text(qa, system="SYS ")
    ids, labels = datasets.tokenize_conversation(
        tok, conv, assistant_pattern=datasets.ANSWER_PATTERNS["vicuna"])
    rev = {v: k for k, v in tok.vocab.items()}
    unmasked_text = " ".join(rev[int(i)] for i, l in zip(ids, labels)
                             if l != -100)
    masked_text = " ".join(rev[int(i)] for i, l in zip(ids, labels)
                           if l == -100)
    assert "alpha" in unmasked_text and "beta" in unmasked_text
    assert "one" in masked_text and "two" in masked_text
    assert "one" not in unmasked_text and "two" not in unmasked_text


def test_collate_it_batch_phi_dialect_unmasks_answers():
    """The dialect must reach the collator: with the phi pattern the answer
    span is unmasked; with the (wrong) mistral default nothing would be."""
    from infinite_video_tpu.training.collate import collate_it_batch

    tok = ToyTokenizer()
    qa = [{"q": "what ?", "a": "an answer"}]
    conv = datasets.phi_conversation_text(qa)
    frames = np.zeros((2, 4, 4, 3), np.float32)
    batch = collate_it_batch([(frames, conv, "inst")], tok,
                             num_query_tokens=4, dialect="phi")
    assert (batch["labels"] != -100).any()
    batch_wrong = collate_it_batch([(frames, conv, "inst")], tok,
                                   num_query_tokens=4, dialect="mistral")
    assert not (batch_wrong["labels"] != -100).any()
