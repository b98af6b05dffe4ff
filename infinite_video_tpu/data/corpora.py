"""Named-corpus registry: the reference's corpus tables as data.

Rebuilds infty-VideoChat2/configs/data.py (pretrain corpora) and
configs/instruction_data.py (instruction corpora + the videochat2_instruction
mixes) as a declarative registry instead of module-level dict mutation.
Reference paths use two placeholders which resolve lazily at lookup time:

  {anno}  — annotation root (reference: anno_root_pt / anno_root_it)
  {data}  — media root (reference: "your_data_path" / data_root)

so the tables ship with the framework and bind to a deployment's storage via
config (`corpora_anno_root` / `corpora_data_root`) or the VL_DATA_DIR env var
the reference documents. `build_corpus_loaders` turns resolved corpora into
the named per-source loaders MetaLoader interleaves — the layer that makes
the 3-stage recipe runnable by corpus name.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

__all__ = ["Corpus", "register_corpus", "register_mix", "resolve_corpus",
           "available_corpora", "PRETRAIN_CORPORA", "INSTRUCTION_CORPORA",
           "MIXES"]


@dataclasses.dataclass(frozen=True)
class Corpus:
    name: str
    anno_file: str          # may contain {anno}
    data_root: str          # may contain {data}; "" = absolute paths in anno
    media: str = "image"    # image | video | text
    read_from: str = "auto"  # "img" = frame-JPEG dirs (sharegptvideo style)
    kind: str = "instruction"  # instruction | caption


_CORPORA: Dict[str, Corpus] = {}
_MIXES: Dict[str, Tuple[str, ...]] = {}


def register_corpus(corpus: Corpus) -> Corpus:
    _CORPORA[corpus.name] = corpus
    return corpus


def register_mix(name: str, members: Sequence[str]) -> None:
    _MIXES[name] = tuple(members)


def available_corpora() -> List[str]:
    return sorted(_CORPORA) + sorted(_MIXES)


def resolve_corpus(name: str, anno_root: str = "", data_root: str = "",
                   ) -> List[Corpus]:
    """Resolve a corpus or mix name to concrete Corpus entries with
    placeholders substituted. Mirrors the reference's lazy `train_file`
    interpolation (utils/config_utils.py + configs/data.py)."""
    anno_root = anno_root or os.environ.get("VL_DATA_DIR", "")
    if name in _MIXES:
        out: List[Corpus] = []
        for m in _MIXES[name]:
            out.extend(resolve_corpus(m, anno_root, data_root))
        return out
    if name not in _CORPORA:
        raise KeyError(
            f"unknown corpus '{name}'; known: {available_corpora()[:12]}...")
    c = _CORPORA[name]
    return [dataclasses.replace(
        c,
        anno_file=c.anno_file.format(anno=anno_root),
        data_root=c.data_root.format(data=data_root))]


def _pt(name, anno, root, media="image"):
    register_corpus(Corpus(name, "{anno}/anno_pretrain/" + anno,
                           ("{data}/videos_images/" + root) if root else "",
                           media=media, kind="caption"))


def _it(name, anno, root, media="image", read_from="auto"):
    register_corpus(Corpus(name, "{anno}/anno_it/" + anno,
                           ("{data}/" + root) if root else "",
                           media=media, read_from=read_from,
                           kind="instruction"))


# ---- pretrain corpora (configs/data.py:12-49) ------------------------------
_pt("cc3m", "cc3m_train.json", "cc3m")
_pt("cc12m", "cc12m_train.json", "cc12m")
_pt("sbu", "sbu.json", "sbu")
_pt("vg", "vg.json", "vg")
_pt("coco", "coco.json", "coco")
_pt("webvid", "webvid_train.json", "webvid", "video")
_pt("webvid_10m", "webvid_10m_train.json", "webvid_10m", "video")
_pt("internvid_10m", "internvid_10m_train.json", "internvid_10m", "video")
_pt("msrvtt_1k_test", "msrvtt_test1k.json", "MSRVTT_Videos", "video")

# composed pretrain mixes (configs/data.py:52-77)
register_mix("webvid_cc3m", ["webvid", "cc3m"])
register_mix("webvid_14m", ["webvid", "cc3m", "coco", "vg", "sbu", "cc12m"])
register_mix("webvid10m_cc3m", ["webvid_10m", "cc3m"])
register_mix("webvid10m_cc14m", ["webvid_10m", "cc3m", "cc12m"])
register_mix("webvid10m_cc14m_plus",
             ["webvid_10m", "cc3m", "coco", "vg", "sbu", "cc12m",
              "internvid_10m"])

# ---- instruction corpora (configs/instruction_data.py:7-285) ---------------
# image
_it("caption_coco", "image/caption/coco/train.json", "coco_caption")
_it("caption_coco_100k", "image/caption/coco/train_100k.json", "coco_caption")
_it("caption_llava", "image/caption/llava/train.json", "coco_caption")
_it("caption_minigpt4", "image/caption/minigpt4/train.json", "minigpt4/image")
_it("caption_paragraph_captioning",
    "image/caption/paragraph_captioning/train.json",
    "m3it/image-paragraph-captioning")
_it("caption_textcaps", "image/caption/textcaps/train.json", "m3it/textcap")
_it("classification_imagenet", "image/classification/imagenet/train.json",
    "m3it/imagenet")
_it("classification_coco_itm", "image/classification/coco_itm/train.json",
    "m3it/coco-itm")
_it("conversation_llava", "image/conversation/llava/train.json",
    "coco_caption")
_it("reasoning_clevr", "image/reasoning/clevr/train.json", "m3it/clevr")
_it("reasoning_visual_mrc", "image/reasoning/visual_mrc/train.json",
    "m3it/visual-mrc")
_it("reasoning_llava", "image/reasoning/llava/train.json", "coco_caption")
_it("reasoning_science_qa", "image/reasoning/science_qa/train.json",
    "m3it/science-qa")
_it("vqa_vqav2", "image/vqa/vqav2/train.json", "m3it/vqa-v2")
_it("vqa_gqa", "image/vqa/gqa/train.json", "m3it/gqa")
_it("vqa_okvqa", "image/vqa/okvqa/train.json", "m3it/okvqa")
_it("vqa_a_okvqa", "image/vqa/a_okvqa/train.json", "m3it/a-okvqa")
_it("vqa_viquae", "image/vqa/viquae/train.json", "m3it/viquae")
_it("vqa_ocr_vqa", "image/vqa/ocr_vqa/train.json", "m3it/ocr-vqa")
_it("vqa_text_vqa", "image/vqa/text_vqa/train.json", "m3it/text-vqa")
_it("vqa_st_vqa", "image/vqa/st_vqa/train.json", "m3it/st-vqa")
_it("vqa_docvqa", "image/vqa/docvqa/train.json", "m3it/docvqa")
_it("vqa_infovqa", "image/vqa/infovqa/train_gpt.json",
    "ocr_data/InfoVQA/infographicVQA_train_v1.0_images")
_it("vqa_ai2d", "image/vqa/ai2d/train.json", "ai2diagram/ai2d/images")
_it("vqa_chart_qa", "image/vqa/chart_qa/train.json",
    "chartqa/ChartQA Dataset/train/png")
_it("vqa_dvqa_80k", "image/vqa/dvqa/train_80k.json", "DVQA/images")
_it("grounding_coco", "image/grounding/coco/train.json",
    "videollava/llava_image_tune/coco")
_it("grounding_vg", "image/grounding/vg/train.json",
    "videollava/llava_image_tune/vg")
_it("conversation_lvis_instruct4v",
    "image/conversation/lvis_instruct4v/train.json", "")
_it("caption_sharegpt4v_420k", "image/caption/sharegpt4v/train_420k.json",
    "sharegpt4v/data")
# video
_it("caption_textvr", "video/caption/textvr/train.json", "TextVR/Video",
    "video")
_it("caption_videochat", "video/caption/videochat/train.json", "WebVid10M",
    "video")
_it("caption_webvid", "video/caption/webvid/train.json", "WebVid2M", "video")
_it("caption_webvid_80k", "video/caption/webvid/train_80k.json", "WebVid2M",
    "video")
_it("caption_youcook2", "video/caption/youcook2/train.json",
    "youcook2/split_videos", "video")
_it("caption_smit", "video/caption/s_mit/train.json", "S-MiT", "video")
_it("caption_smit_40k", "video/caption/s_mit/train_40k.json", "S-MiT", "video")
_it("classification_k710", "video/classification/k710/train.json", "",
    "video")
_it("classification_ssv2", "video/classification/ssv2/train.json",
    "video_pub/ssv2_video", "video")
_it("conversation_videochat1", "video/conversation/videochat1/train.json",
    "WebVid10M", "video")
_it("conversation_videochat2", "video/conversation/videochat2/train.json",
    "internvid", "video")
_it("conversation_videochatgpt", "video/conversation/videochatgpt/train.json",
    "ANet/ANet_320p_fps30", "video")
_it("reasoning_next_qa", "video/reasoning/next_qa/train.json", "nextqa",
    "video")
_it("reasoning_clevrer_qa", "video/reasoning/clevrer_qa/train.json",
    "clevrer/video_train", "video")
_it("reasoning_clevrer_mc", "video/reasoning/clevrer_mc/train.json",
    "clevrer/video_train", "video")
_it("vqa_ego_qa", "video/vqa/ego_qa/train.json", "EgoQA/split_videos",
    "video")
_it("vqa_tgif_frame_qa", "video/vqa/tgif_frame_qa/train.json", "tgif", "video")
_it("vqa_tgif_transition_qa", "video/vqa/tgif_transition_qa/train.json",
    "tgif", "video")
_it("vqa_webvid_qa", "video/vqa/webvid_qa/train.json", "WebVid2M", "video")
_it("vqa_webvid_qa_30k", "video/vqa/webvid_qa/train_30k.json", "WebVid2M",
    "video")
_it("caption_sharegptvideo_300k", "video/caption/sharegptvideo/train_300k.json",
    "LLaVA_DPO/train_300k", "video", read_from="img")
_it("vqa_sharegptvideo_240k", "video/vqa/sharegptvideo/train_240k.json",
    "LLaVA_DPO/train_300k", "video", read_from="img")
_it("caption_vidln_kinetics", "video/caption/vidln/kinetics_train.json", "",
    "video")
_it("caption_vidln_oops", "video/caption/vidln/oops_train.json",
    "oops/oops_video/train", "video")
_it("caption_vidln_ovis", "video/caption/vidln/ovis_train.json", "ovis/train",
    "video", read_from="img")
_it("caption_vidln_uvo_sparse", "video/caption/vidln/uvo_sparse_train.json",
    "UVO/uvo_videos_sparse", "video")
_it("caption_vidln_uvo_dense", "video/caption/vidln/uvo_dense_train.json",
    "UVO/uvo_videos_dense", "video")
_it("caption_favd", "video/caption/favd/train.json", "favd", "video")
_it("grounding_didemo", "video/grounding/didemo/train.json", "DiDeMo", "video")
# text
_it("conversation_sharegpt", "text/sharegpt/train.json", "", "text")

# instruction mixes (instruction_data.py:289-429)
register_mix("videochat2_instruction", [
    "caption_coco", "caption_llava", "caption_minigpt4",
    "caption_paragraph_captioning", "caption_textcaps",
    "classification_imagenet", "classification_coco_itm",
    "conversation_llava", "reasoning_clevr", "reasoning_visual_mrc",
    "reasoning_llava", "vqa_vqav2", "vqa_gqa", "vqa_okvqa", "vqa_a_okvqa",
    "vqa_viquae", "vqa_ocr_vqa", "vqa_text_vqa", "vqa_st_vqa", "vqa_docvqa",
    "caption_textvr", "caption_videochat", "caption_webvid",
    "caption_youcook2", "classification_k710", "classification_ssv2",
    "conversation_videochat1", "conversation_videochat2",
    "conversation_videochatgpt", "reasoning_next_qa", "reasoning_clevrer_qa",
    "reasoning_clevrer_mc", "vqa_ego_qa", "vqa_tgif_frame_qa",
    "vqa_tgif_transition_qa", "vqa_webvid_qa"])
register_mix("videochat2_instruction_new", [
    "caption_coco_100k", "caption_llava", "caption_minigpt4",
    "caption_paragraph_captioning", "caption_textcaps",
    "classification_imagenet", "classification_coco_itm",
    "conversation_llava", "reasoning_clevr", "reasoning_visual_mrc",
    "reasoning_llava", "vqa_vqav2", "vqa_gqa", "vqa_okvqa", "vqa_a_okvqa",
    "vqa_viquae", "vqa_ocr_vqa", "vqa_text_vqa", "vqa_st_vqa", "vqa_docvqa",
    "caption_textvr", "caption_videochat", "caption_webvid_80k",
    "caption_youcook2", "caption_smit", "classification_k710",
    "classification_ssv2", "conversation_videochat1",
    "conversation_videochat2", "conversation_videochatgpt",
    "reasoning_next_qa", "reasoning_clevrer_qa", "reasoning_clevrer_mc",
    "vqa_ego_qa", "vqa_tgif_frame_qa", "vqa_tgif_transition_qa",
    "vqa_webvid_qa"])
register_mix("videochat2_instruction_hd", [
    "caption_llava", "caption_minigpt4", "caption_paragraph_captioning",
    "caption_textcaps", "conversation_llava", "reasoning_clevr",
    "reasoning_visual_mrc", "reasoning_llava", "vqa_vqav2", "vqa_gqa",
    "vqa_okvqa", "vqa_a_okvqa", "vqa_viquae", "vqa_ocr_vqa", "vqa_text_vqa",
    "vqa_st_vqa", "vqa_docvqa", "reasoning_science_qa", "vqa_infovqa",
    "conversation_lvis_instruct4v", "vqa_ai2d", "vqa_chart_qa",
    "vqa_dvqa_80k", "caption_sharegpt4v_420k", "grounding_coco",
    "grounding_vg", "caption_textvr", "caption_videochat",
    "caption_youcook2", "caption_smit_40k", "classification_k710",
    "classification_ssv2", "conversation_videochat1",
    "conversation_videochat2", "conversation_videochatgpt",
    "reasoning_next_qa", "reasoning_clevrer_qa", "reasoning_clevrer_mc",
    "vqa_ego_qa", "vqa_tgif_transition_qa", "vqa_webvid_qa_30k",
    "caption_sharegptvideo_300k", "vqa_sharegptvideo_240k",
    "caption_vidln_kinetics", "caption_vidln_oops", "caption_vidln_ovis",
    "caption_vidln_uvo_sparse", "caption_vidln_uvo_dense", "caption_favd",
    "grounding_didemo", "conversation_sharegpt"])

# LAVIS builder names (InfVideoLLaMA/datasets/builders: webvid caption,
# cc_sbu, laion, llava_instruct, webvid_instruct) — same table, LLaMA-side
# naming, so LAVIS-style configs resolve too.
register_corpus(Corpus("webvid_caption", "{anno}/webvid/annotations.json",
                       "{data}/webvid/videos", media="video", kind="caption"))
register_corpus(Corpus("cc_sbu", "{anno}/cc_sbu/annotations.json",
                       "{data}/cc_sbu/images", kind="caption"))
register_corpus(Corpus("laion", "{anno}/laion/annotations.json",
                       "{data}/laion/images", kind="caption"))
register_corpus(Corpus("llava_instruct", "{anno}/llava/instruct.json",
                       "{data}/coco/images", kind="instruction"))
register_corpus(Corpus("webvid_instruct", "{anno}/webvid/instruct.json",
                       "{data}/webvid/videos", media="video",
                       kind="instruction"))


PRETRAIN_CORPORA = tuple(n for n, c in _CORPORA.items() if c.kind == "caption")
INSTRUCTION_CORPORA = tuple(n for n, c in _CORPORA.items()
                            if c.kind == "instruction")
MIXES = _MIXES


def build_corpus_loaders(names: Sequence[str], *, processor, tokenizer,
                         num_frames: int, num_query_tokens: int,
                         batch_size: int = 1, anno_root: str = "",
                         data_root: str = "", dialect: str = "mistral",
                         seed: int = 0, stage: str = "it",
                         max_txt_len: int = 32):
    """Named corpora -> {name: loader} for MetaLoader interleaving.

    The runnable-recipe layer: a config may say
    `datasets: {mix: videochat2_instruction}` and training resolves every
    member corpus into a batched loader (instruction corpora) or caption
    loader (pretrain corpora). stage="qformer" builds stage-1 contrastive
    batches (collate_qformer_batch) from caption corpora instead."""
    from infinite_video_tpu.data.datasets import (CaptionDataset,
                                                  InstructionDataset)
    from infinite_video_tpu.data.loader import StatefulShardSampler
    from infinite_video_tpu.training.collate import collate_it_batch

    loaders = {}
    for name in names:
        for corpus in resolve_corpus(name, anno_root, data_root):
            if corpus.kind == "caption" or stage == "qformer":
                if stage == "qformer" and corpus.kind != "caption":
                    raise ValueError(
                        f"stage-1 pretrains on caption corpora; "
                        f"{corpus.name!r} is kind={corpus.kind!r}")
                ds = CaptionDataset(corpus.anno_file, corpus.data_root,
                                    processor, num_frames=num_frames)
            else:
                ds = InstructionDataset(corpus.anno_file, corpus.data_root,
                                        processor, num_frames=num_frames,
                                        dialect=dialect)
            sampler = StatefulShardSampler(len(ds), batch_size, seed=seed)
            loaders[corpus.name] = _BatchLoader(
                ds, sampler, batch_size, tokenizer, num_query_tokens,
                collate_it_batch, dialect, stage=stage,
                max_txt_len=max_txt_len)
    return loaders


class _BatchLoader:
    def __init__(self, ds, sampler, bs, tokenizer, num_query_tokens, collate,
                 dialect="mistral", stage="it", max_txt_len=32):
        self.ds, self.sampler, self.bs = ds, sampler, bs
        self.tokenizer, self.q, self.collate = tokenizer, num_query_tokens, collate
        self.dialect = dialect
        self.stage = stage
        self.max_txt_len = max_txt_len

    def _normalize(self, sample):
        """Caption pairs become single-turn conversations (pt-stage prompt)."""
        if len(sample) == 2:
            from infinite_video_tpu.data import datasets as ds

            frames, caption = sample
            qa = [{"q": "", "a": caption}]
            text_fn = {"mistral": ds.mistral_conversation_text,
                       "phi": ds.phi_conversation_text,
                       "vicuna": ds.vicuna_conversation_text}[self.dialect]
            conv = text_fn(qa)
            return frames, conv, ""
        return sample

    def __len__(self):
        return len(self.sampler) // self.bs

    def __iter__(self):
        if self.stage == "qformer":
            from infinite_video_tpu.training.collate import collate_qformer_batch

            batch = []
            for i in self.sampler:
                frames, caption = self.ds[i][:2]
                batch.append((frames, caption, i))
                if len(batch) == self.bs:
                    yield collate_qformer_batch(batch, self.tokenizer,
                                                max_txt_len=self.max_txt_len)
                    batch = []
            return
        batch = []
        for i in self.sampler:
            batch.append(self._normalize(self.ds[i]))
            if len(batch) == self.bs:
                yield self.collate(batch, self.tokenizer,
                                   num_query_tokens=self.q,
                                   dialect=self.dialect)
                batch = []
