"""Layered checkpoint loading: torch .pth stacks → flax param trees.

The reference assembles its models from stacked partial checkpoints with
`strict=False` semantics:
  ∞-Video-LLaMA (infinityqa.py:60,121,530-539):
    1. BLIP-2 Q-former pretrain (blip2_pretrained_flant5xxl.pth)
    2. MiniGPT-4 / Video-LLaMA llama_proj + video Q-former ("ckpt")
    3. finetune checkpoint ("ckpt_2")
  ∞-VideoChat2 (videochat2_it_mistral.py:81-86,165-173;
  run_nextqa_mistral.py:470-487):
    1. vit_blip (UMT ViT + Q-former)
    2. videochat2 stage-2/3 checkpoint
    3. LoRA stage-3 state_dict, merged into the Mistral weights

Here each stage is converted with the matching converter (qformer / vit /
decoder) and deep-merged onto the param tree — later stages override earlier
ones, missing keys keep their initialization (exactly `strict=False`), and
every source key that maps to no parameter is collected into the `report`
dict and logged — key-naming drift loads loudly instead of silently.
Training-side save/restore of full TrainStates uses orbax
(save_train_state / restore_train_state).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Iterable, List, Mapping, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

from infinite_video_tpu.convert.decoder import convert_decoder_state_dict, merge_lora
from infinite_video_tpu.convert.qformer import convert_qformer_state_dict
from infinite_video_tpu.convert.vit import convert_vit_state_dict

__all__ = ["load_torch_state_dict", "split_reference_checkpoint",
           "deep_merge", "assemble_infvideollama_params",
           "assemble_videochat2_params", "assemble_videochat2_qformer_params",
           "save_train_state", "restore_train_state"]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.bin into {name: np.ndarray} (handles 'model' wrap)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "module" in obj and isinstance(obj["module"], dict):
        obj = obj["module"]
    return {k: v for k, v in obj.items() if hasattr(v, "shape")}


def deep_merge(base: Dict, update: Mapping) -> Dict:
    """Recursively overlay `update` onto `base` (strict=False load)."""
    for k, v in update.items():
        if isinstance(v, Mapping) and isinstance(base.get(k), dict):
            deep_merge(base[k], v)
        else:
            base[k] = v
    return base


def split_reference_checkpoint(sd: Mapping[str, np.ndarray]) -> Dict[str, Dict]:
    """Split a mixed reference state_dict into per-component sub-dicts by the
    reference's module prefixes."""
    comps: Dict[str, Dict] = {
        "visual_encoder": {}, "ln_vision": {}, "qformer": {},
        "video_qformer": {}, "query_tokens": {}, "video_query_tokens": {},
        "llama_proj": {}, "mistral_proj": {}, "decoder": {},
        "vision_layernorm": {}, "extra_query_tokens": {},
        "video_frame_position_embedding": {}, "other": {},
    }
    for k, v in sd.items():
        if k.startswith(("visual_encoder.", "vision_encoder.")):
            comps["visual_encoder"][k.split(".", 1)[1]] = v
        elif k.startswith("ln_vision."):
            comps["ln_vision"][k.split(".", 1)[1]] = v
        elif k.startswith("vision_layernorm."):
            comps["vision_layernorm"][k.split(".", 1)[1]] = v
        elif k.startswith("video_Qformer."):
            comps["video_qformer"][k.split(".", 1)[1]] = v
        elif k.startswith(("Qformer.", "qformer.")):
            comps["qformer"][k.split(".", 1)[1]] = v
        elif k == "query_tokens":
            comps["query_tokens"][k] = v
        elif k == "video_query_tokens":
            comps["video_query_tokens"][k] = v
        elif k == "extra_query_tokens":
            comps["extra_query_tokens"][k] = v
        elif k.startswith("video_frame_position_embedding"):
            comps["video_frame_position_embedding"][k] = v
        elif k.startswith("llama_proj."):
            comps["llama_proj"][k.split(".", 1)[1]] = v
        elif k.startswith("mistral_proj."):
            comps["mistral_proj"][k.split(".", 1)[1]] = v
        elif k.startswith(("llama_model.", "mistral_model.")):
            comps["decoder"][k.split(".", 1)[1]] = v
        else:
            comps["other"][k] = v
    return comps


def _dense(sub: Mapping, out: Dict, name: str):
    if "weight" in sub:
        out[name] = {"kernel": np.ascontiguousarray(np.asarray(sub["weight"], np.float32).T)}
        if "bias" in sub:
            out[name]["bias"] = np.asarray(sub["bias"], np.float32)


def _layernorm(sub: Mapping, out: Dict, name: str):
    if "weight" in sub:
        out[name] = {"scale": np.asarray(sub["weight"], np.float32),
                     "bias": np.asarray(sub["bias"], np.float32)}


def _report_unconsumed(report: Optional[Dict], path: str, keys: List[str]):
    """Record + log source keys no converter consumed (strict=False, loudly)."""
    if keys:
        logger.warning("checkpoint %s: %d unconsumed keys (first 10: %s)",
                       path, len(keys), keys[:10])
    if report is not None:
        report.setdefault(path, []).extend(keys)


def assemble_infvideollama_params(
    init_params: Dict,
    checkpoint_paths: Iterable[str],
    decoder_path: Optional[str] = None,
    report: Optional[Dict] = None,
) -> Tuple[Dict, Dict]:
    """Overlay reference ∞-Video-LLaMA checkpoints onto an encoder init tree.

    Returns (encoder_params, decoder_params_or_None). `checkpoint_paths` are
    applied in order (q_former_model, ckpt, ckpt_2 — infinityqa.py semantics).
    `report`, when given, collects {checkpoint_path: [unconsumed keys]}.
    """
    params = init_params
    for path in checkpoint_paths:
        sd = load_torch_state_dict(path)
        comps = split_reference_checkpoint(sd)
        lost: List[str] = list(comps["other"])

        def convert(fn, comp, prefix, **kw):
            sub: List[str] = []
            out = fn(comps[comp], unconsumed=sub, **kw)
            lost.extend(prefix + k for k in sub)
            return out

        upd: Dict = {}
        if comps["visual_encoder"]:
            upd["visual_encoder"] = convert(convert_vit_state_dict,
                                            "visual_encoder", "visual_encoder.")
        if comps["ln_vision"]:
            _layernorm(comps["ln_vision"], upd, "ln_vision")
        if comps["qformer"]:
            upd["Qformer"] = convert(convert_qformer_state_dict,
                                     "qformer", "Qformer.")
        if comps["video_qformer"]:
            upd["video_Qformer"] = convert(convert_qformer_state_dict,
                                           "video_qformer", "video_Qformer.")
        if comps["query_tokens"]:
            upd["query_tokens"] = np.asarray(
                comps["query_tokens"]["query_tokens"], np.float32)
        if comps["video_query_tokens"]:
            upd["video_query_tokens"] = np.asarray(
                comps["video_query_tokens"]["video_query_tokens"], np.float32)
        if comps["video_frame_position_embedding"]:
            w = comps["video_frame_position_embedding"][
                "video_frame_position_embedding.weight"]
            upd["video_frame_position_embedding"] = np.asarray(w, np.float32)
        if comps["llama_proj"]:
            _dense(comps["llama_proj"], upd, "llama_proj")
        if comps["decoder"]:
            # decoder weights inside a mixed checkpoint are loaded only via
            # decoder_path; flag them so a full-model .pth isn't half-read
            lost.extend("llama_model." + k for k in comps["decoder"])
        _report_unconsumed(report, path, lost)
        deep_merge(params, upd)
    decoder_params = None
    if decoder_path:
        lost = []
        decoder_params = convert_decoder_state_dict(
            load_torch_state_dict(decoder_path), unconsumed=lost)
        _report_unconsumed(report, decoder_path, lost)
    return params, decoder_params


def assemble_videochat2_params(
    init_params: Dict,
    checkpoint_paths: Iterable[str],
    decoder_path: Optional[str] = None,
    lora_path: Optional[str] = None,
    lora_alpha: float = 32.0,
    lora_r: int = 16,
    report: Optional[Dict] = None,
) -> Tuple[Dict, Optional[Dict]]:
    """Overlay VC2 checkpoints (vit_blip → stage ckpt) and merge stage-3 LoRA
    into the Mistral decoder weights. `report`, when given, collects
    {checkpoint_path: [unconsumed keys]}."""
    params = init_params
    for path in checkpoint_paths:
        sd = load_torch_state_dict(path)
        comps = split_reference_checkpoint(sd)
        lost: List[str] = list(comps["other"])

        def convert(fn, comp, prefix, **kw):
            sub: List[str] = []
            out = fn(comps[comp], unconsumed=sub, **kw)
            lost.extend(prefix + k for k in sub)
            return out

        upd: Dict = {}
        if comps["visual_encoder"]:
            upd["vision_encoder"] = convert(convert_vit_state_dict,
                                            "visual_encoder", "vision_encoder.")
        if comps["vision_layernorm"]:
            _layernorm(comps["vision_layernorm"], upd, "vision_layernorm")
        if comps["qformer"]:
            upd["qformer"] = convert(convert_qformer_state_dict,
                                     "qformer", "qformer.")
        if comps["query_tokens"]:
            upd["query_tokens"] = np.asarray(comps["query_tokens"]["query_tokens"],
                                             np.float32)
        if comps["extra_query_tokens"]:
            upd["extra_query_tokens"] = np.asarray(
                comps["extra_query_tokens"]["extra_query_tokens"], np.float32)
        if comps["mistral_proj"]:
            _dense(comps["mistral_proj"], upd, "mistral_proj")
        if comps["decoder"]:
            # LoRA-bearing stage ckpts carry mistral_model.* adapter keys;
            # those merge via decoder_path+lora_path, not here
            if not lora_path:
                lost.extend("mistral_model." + k for k in comps["decoder"])
        _report_unconsumed(report, path, lost)
        deep_merge(params, upd)

    decoder_params = None
    if decoder_path:
        dec_sd = load_torch_state_dict(decoder_path)
        if lora_path:
            lora_sd = load_torch_state_dict(lora_path)
            dec_sd = {**dec_sd, **lora_sd}
            dec_sd = merge_lora(dec_sd, lora_alpha=lora_alpha, r=lora_r)
        lost = []
        decoder_params = convert_decoder_state_dict(dec_sd, unconsumed=lost)
        _report_unconsumed(report, decoder_path, lost)
    return params, decoder_params


def interpolate_temporal_embed(old: np.ndarray, t_new: int) -> np.ndarray:
    """load_temp_embed_with_mismatch(add_zero=False) semantics
    (models/utils.py:56-99): truncate when shrinking; linear-interpolate along
    time (F.interpolate mode='linear', align_corners=False) when growing.
    old: [1, T0, 1, C] -> [1, t_new, 1, C]."""
    t0 = old.shape[1]
    if t_new == t0:
        return old
    if t_new < t0:
        return old[:, :t_new]
    scale = t0 / t_new
    x = np.clip((np.arange(t_new) + 0.5) * scale - 0.5, 0.0, t0 - 1.0)
    lo = np.floor(x).astype(int)
    hi = np.minimum(lo + 1, t0 - 1)
    w = (x - lo)[None, :, None, None].astype(old.dtype)
    return old[:, lo] * (1 - w) + old[:, hi] * w


def assemble_videochat2_qformer_params(
    init_params: Dict,
    checkpoint_path: str,
    report: Optional[Dict] = None,
) -> Dict:
    """Stage-1 Q-former pretrain checkpoint → VideoChat2QFormerPretrain tree.

    Accepts the reference stage-1 layout (videochat2_qformer.py:39-64:
    vision_encoder.*, qformer.* incl. cls head, query_tokens, vision_proj,
    text_proj, itm_head, temp) — the xbert-shaped stage-1 weights load here,
    with the MLM cls head routed to our `lm_head`."""
    from infinite_video_tpu.convert.qformer import convert_lm_head_state_dict

    sd = load_torch_state_dict(checkpoint_path)
    # scalars (temp) are dropped by load_torch_state_dict's shape filter
    import torch

    raw = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict):
        for wrap in ("model", "module"):
            if wrap in raw and isinstance(raw[wrap], dict):
                raw = raw[wrap]
        if "temp" in raw and hasattr(raw["temp"], "numpy"):
            sd["temp"] = raw["temp"].detach().float().numpy()

    comps: Dict[str, Dict] = {"vision_encoder": {}, "qformer": {},
                              "vision_proj": {}, "text_proj": {},
                              "itm_head": {}, "other": {}}
    upd: Dict = {}
    for k, v in sd.items():
        if k.startswith(("vision_encoder.", "visual_encoder.")):
            comps["vision_encoder"][k.split(".", 1)[1]] = v
        elif k.startswith(("qformer.", "Qformer.", "text_encoder.")):
            comps["qformer"][k.split(".", 1)[1]] = v
        elif k == "query_tokens":
            upd["query_tokens"] = np.asarray(v, np.float32)
        elif k == "temp":
            upd["temp"] = np.asarray(v, np.float32).reshape(())
        elif k == "vision_temp_embed":
            # frame-count mismatches interpolate (builder.py:38-41 with
            # add_zero=False; target frame count from the model's init tree)
            tgt = init_params.get("vision_temp_embed")
            t_new = tgt.shape[1] if tgt is not None else v.shape[1]
            upd["vision_temp_embed"] = interpolate_temporal_embed(
                np.asarray(v, np.float32), int(t_new))
        elif k.startswith("vision_layernorm."):
            ln = upd.setdefault("vision_layernorm", {})
            field = "scale" if k.endswith(".weight") else "bias"
            ln[field] = np.asarray(v, np.float32)
        elif k.startswith(("vision_proj.", "text_proj.", "itm_head.")):
            comps[k.split(".", 1)[0]][k.split(".", 1)[1]] = v
        else:
            comps["other"][k] = v

    lost: List[str] = list(comps["other"])
    if comps["vision_encoder"]:
        sub: List[str] = []
        upd["vision_encoder"] = convert_vit_state_dict(
            comps["vision_encoder"], unconsumed=sub)
        lost.extend("vision_encoder." + k for k in sub)
    if comps["qformer"]:
        sub = []
        upd["qformer"] = convert_qformer_state_dict(comps["qformer"],
                                                    unconsumed=sub)
        lost.extend("qformer." + k for k in sub)
        head = convert_lm_head_state_dict(comps["qformer"])
        if head:
            upd["lm_head"] = head
    for name in ("vision_proj", "text_proj", "itm_head"):
        if comps[name]:
            _dense(comps[name], upd, name)
    _report_unconsumed(report, checkpoint_path, lost)
    return deep_merge(init_params, upd)


# --------------------------------------------------------------------------
# Training-side checkpointing (orbax): full TrainState save/auto-resume,
# replacing the reference's epoch/iter checkpoint scan
# (tasks/shared_utils.py:64-99, shared_utils_ds.py:78-120).


def save_train_state(ckpt_dir: str, step: int, state) -> str:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"ckpt_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def restore_train_state(ckpt_dir: str, template):
    """Restore the latest ckpt_* under ckpt_dir; None when absent."""
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None, -1
    cands = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("ckpt_"))
    if not cands:
        return None, -1
    path = os.path.join(os.path.abspath(ckpt_dir), cands[-1])
    step = int(cands[-1].split("_")[1])
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template), step
