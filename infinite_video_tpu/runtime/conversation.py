"""Conversation state + Chat runtime: prompt assembly and answer generation.

Functional port of the reference chat layer
(infty-Video-LLaMA/InfVideoLLaMA/conversation/conversation_video.py:24-283 and
infty-VideoChat2/conversation.py): prompts are built from role-tagged
messages, split on the `<ImageHere>` placeholder, tokenized per segment (BOS
only on the first), embedded, and interleaved with the video query embeddings
before a single `generate` call with "###" stop sequences.

The Chat class is model-agnostic: it takes the encoder apply-fn, the decoder
(`models.decoder.Decoder`) with params, and any HF-style tokenizer.
"""

from __future__ import annotations

import dataclasses
from enum import Enum, auto
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from infinite_video_tpu.runtime.generation import (GenerationConfig, generate,
                                                   host_embed_table,
                                                   interleave_prompt_embeds)

__all__ = ["SeparatorStyle", "Conversation", "CONV_VISION",
           "default_conversation", "mistral_conversation", "Chat"]


class SeparatorStyle(Enum):
    SINGLE = auto()
    TWO = auto()


@dataclasses.dataclass
class Conversation:
    """Role-tagged message history (conversation_video.py:30-97)."""

    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]]
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None

    def get_prompt(self) -> str:
        if self.sep_style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in self.messages:
                if message:
                    ret += role + ": " + message + self.sep
                else:
                    ret += role + ":"
            return ret
        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            ret = self.system + seps[0]
            for i, (role, message) in enumerate(self.messages):
                if message:
                    ret += role + ": " + message + seps[i % 2]
                else:
                    ret += role + ":"
            return ret
        raise ValueError(f"Invalid style: {self.sep_style}")

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(system=self.system, roles=self.roles,
                            messages=[[r, m] for r, m in self.messages],
                            offset=self.offset, sep_style=self.sep_style,
                            sep=self.sep, sep2=self.sep2)


CONV_VISION = Conversation(
    system="Give the following image: <Img>ImageContent</Img>. "
           "You will be able to see the image once I provide it to you. "
           "Please answer my questions.",
    roles=("Human", "Assistant"), messages=[],
)

default_conversation = Conversation(system="", roles=("Human", "Assistant"),
                                    messages=[])

# VC2 Mistral instruct dialect (videochat2_it_mistral.py:38-45 and
# eval_code/run_nextqa_mistral.py prompt protocol).
mistral_conversation = Conversation(
    system="", roles=("[INST]", "[/INST]"), messages=[],
    sep_style=SeparatorStyle.TWO, sep=" ", sep2="</s>",
)

# Stop-word token ids for "###" under the LLaMA tokenizer
# (conversation_video.py:142-144).
LLAMA_STOP_SEQUENCES = ((835,), (2277, 29937))


class Chat:
    """ask / upload_video / answer (conversation_video.py:100-283).

    encode_video: Callable(chunks [C,B,T,H,W,3], rng) -> [B, Q, llm_width] —
    typically a jitted closure over (encoder, params) using
    runtime.streaming.stream_mean_embedding.
    """

    def __init__(self, encode_video: Callable, decoder, decoder_params,
                 tokenizer, stop_sequences=LLAMA_STOP_SEQUENCES,
                 image_placeholder: str = "<ImageHere>",
                 pad_to_multiple: int = 128):
        # prompt-length bucketing: reuse prefill/decode executables across
        # turns of different lengths (see runtime/generation.py)
        self.pad_to_multiple = pad_to_multiple
        self.encode_video = encode_video
        self.decoder = decoder
        self.decoder_params = decoder_params
        self.tokenizer = tokenizer
        self.stop_sequences = stop_sequences
        self.placeholder = image_placeholder

    def ask(self, text: str, conv: Conversation):
        if (conv.messages and conv.messages[-1][0] == conv.roles[0]
                and conv.messages[-1][1]
                and ("</Video>" in conv.messages[-1][1]
                     or "</Image>" in conv.messages[-1][1])):
            conv.messages[-1][1] = " ".join([conv.messages[-1][1], text])
        else:
            conv.append_message(conv.roles[0], text)

    def upload_video(self, chunks, conv: Conversation, img_list: list,
                     rng: Optional[jax.Array] = None, msg: str = ""):
        """Encode chunked frames into one mean video embedding and register the
        <Video> placeholder (upload_video_without_audio, :196-229)."""
        emb = self.encode_video(chunks, rng if rng is not None else jax.random.PRNGKey(0))
        img_list.append(emb)
        conv.append_message(conv.roles[0], f"<Video>{self.placeholder}</Video> {msg}")
        return "Received."

    def get_context_emb(self, conv: Conversation, img_list: Sequence) -> jnp.ndarray:
        """Interleave prompt-segment embeddings with video embeddings
        (conversation_video.py:265-279)."""
        prompt = conv.get_prompt()
        segs = prompt.split(self.placeholder)
        # host-side gather + splice: no per-length device compiles
        # (runtime/generation.py::interleave_prompt_embeds)
        table = getattr(self, "_embed_table_cache", None)
        if table is None:
            table = host_embed_table(self.decoder_params)
            self._embed_table_cache = table
        return jnp.asarray(interleave_prompt_embeds(
            table, self.tokenizer, segs, list(img_list)))

    def answer(self, conv: Conversation, img_list: Sequence, *,
               max_new_tokens: int = 300, do_sample: bool = True,
               temperature: float = 1.0, top_p: float = 0.9,
               max_length: int = 2000, rng: Optional[jax.Array] = None) -> str:
        conv.append_message(conv.roles[1], None)
        embs = self.get_context_emb(conv, img_list)
        begin = max(0, embs.shape[1] + max_new_tokens - max_length)
        embs = embs[:, begin:]

        eos = getattr(self.tokenizer, "eos_token_id", 2) or 2
        gcfg = GenerationConfig(max_new_tokens=max_new_tokens, do_sample=do_sample,
                                temperature=temperature, top_p=top_p,
                                eos_token_id=eos, pad_token_id=eos,
                                stop_sequences=self.stop_sequences,
                                pad_to_multiple=self.pad_to_multiple)
        tokens = generate(self.decoder, self.decoder_params, gcfg,
                          prompt_embeds=embs, rng=rng)
        ids = [int(t) for t in tokens[0]]
        # strip leading <unk>/<s> (conversation_video.py:180-184)
        while ids and ids[0] in (0, 1):
            ids = ids[1:]
        if eos in ids:  # cut at the first EOS (pad follows it)
            ids = ids[: ids.index(eos)]
        text = self.tokenizer.decode(ids, skip_special_tokens=True)
        text = text.split("###")[0].split("Assistant:")[-1].strip()
        conv.messages[-1][1] = text
        return text
