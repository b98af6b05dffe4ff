"""torch → flax weight conversion for the vision transformers.

Maps the reference EVA-CLIP ViT (eva_vit.py) and UMT ViT (blip2/vit.py)
state_dicts onto `infinite_video_tpu.models.vit.VisionTransformer`. The
patch-embedding conv (Conv2d for EVA, Conv3d with tubelet 1 for UMT) becomes a
Dense over (ph, pw, c)-flattened patch vectors.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

__all__ = ["convert_vit_state_dict"]


def _to_np(w):
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w,
                      dtype=np.float32)


def convert_vit_state_dict(state_dict) -> Dict:
    params: Dict = {}

    def put(path, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v

    for key, w in state_dict.items():
        w = _to_np(w)
        k = key
        for pre in ("encoder.", "visual_encoder.", "vision_encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k in ("pos_embed", "img_pos_embed") and w.ndim == 3 and k == "pos_embed":
            put(("pos_embed",), w)
            continue
        if k == "cls_token":
            put(("cls_token",), w)
            continue
        if k.startswith("patch_embed.proj."):
            if k.endswith("weight"):
                if w.ndim == 5:          # Conv3d [D, C, tub, ph, pw], tubelet 1
                    w = w[:, :, 0]
                # [D, C, ph, pw] -> [(ph, pw, C), D]
                d = w.shape[0]
                kernel = w.transpose(2, 3, 1, 0).reshape(-1, d)
                put(("patch_embed", "kernel"), np.ascontiguousarray(kernel))
            else:
                put(("patch_embed", "bias"), w)
            continue
        if k.startswith("norm.") and "blocks" not in k:
            put(("norm", "scale" if k.endswith("weight") else "bias"), w)
            continue
        m = re.match(r"blocks\.(\d+)\.(.+)", k)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        lp = (f"block_{i}",)
        if rest.startswith("norm1."):
            put(lp + ("norm1", "scale" if rest.endswith("weight") else "bias"), w)
        elif rest.startswith("norm2."):
            put(lp + ("norm2", "scale" if rest.endswith("weight") else "bias"), w)
        elif rest == "attn.qkv.weight":
            put(lp + ("attn", "qkv", "kernel"), np.ascontiguousarray(w.T))
        elif rest == "attn.q_bias":
            put(lp + ("attn", "q_bias"), w)
        elif rest == "attn.v_bias":
            put(lp + ("attn", "v_bias"), w)
        elif rest.startswith("attn.proj."):
            if rest.endswith("weight"):
                put(lp + ("attn", "proj", "kernel"), np.ascontiguousarray(w.T))
            else:
                put(lp + ("attn", "proj", "bias"), w)
        elif rest.startswith("mlp.fc1."):
            if rest.endswith("weight"):
                put(lp + ("fc1", "kernel"), np.ascontiguousarray(w.T))
            else:
                put(lp + ("fc1", "bias"), w)
        elif rest.startswith("mlp.fc2."):
            if rest.endswith("weight"):
                put(lp + ("fc2", "kernel"), np.ascontiguousarray(w.T))
            else:
                put(lp + ("fc2", "bias"), w)
    return params
