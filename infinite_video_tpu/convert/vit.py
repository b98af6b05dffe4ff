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

__all__ = ["convert_vit_state_dict", "interpolate_pos_embed"]


def _to_np(w):
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w,
                      dtype=np.float32)


def interpolate_pos_embed(pos_embed: np.ndarray, target_grid: int) -> np.ndarray:
    """Bicubic-resize a learned [1, 1+g², D] pos-embed to a new grid size
    (eva_vit.py tail: interpolate_pos_embed for non-224 eval resolutions).
    The class-token slot passes through unchanged. Uses jax.image.resize
    (cv2.resize rejects >4-channel images, and ViT widths are 1024/1408)."""
    import jax
    import jax.numpy as jnp

    n = pos_embed.shape[1]
    d = pos_embed.shape[2]
    has_cls = int(round(n ** 0.5)) ** 2 != n
    extra = pos_embed[:, :1] if has_cls else pos_embed[:, :0]
    patches = pos_embed[0, 1 if has_cls else 0:]
    g = int(round(patches.shape[0] ** 0.5))
    if g == target_grid:
        return pos_embed
    grid = jnp.asarray(patches.reshape(g, g, d), jnp.float32)
    resized = np.asarray(jax.image.resize(
        grid, (target_grid, target_grid, d), method="cubic"))
    out = resized.reshape(1, target_grid * target_grid, d)
    return np.concatenate([extra, out], axis=1).astype(np.float32)


# state_dict entries that are valid in reference checkpoints but have no
# target parameter here (buffers / fp16 helpers), skipped by design.
_INTENTIONAL_SKIPS = (".attn.rel_pos_bias", "rope.freqs", ".attn.q_proj_mask",
                      "mask_token", "fc_norm.")


def convert_vit_state_dict(state_dict, target_grid: int | None = None,
                           unconsumed: list | None = None) -> Dict:
    """`target_grid`: interpolate a learned pos-embed to grid×grid patches
    (images at a different eval resolution than the checkpoint's 224).
    `unconsumed`: optional list collecting source keys that mapped to no
    parameter (key-naming drift detector; intentional buffer skips excluded).
    """
    params: Dict = {}

    def put(path, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v

    def note(key):
        if unconsumed is not None and not any(
                s in key for s in _INTENTIONAL_SKIPS):
            unconsumed.append(key)

    for key, w in state_dict.items():
        w = _to_np(w)
        k = key
        for pre in ("encoder.", "visual_encoder.", "vision_encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k == "pos_embed" and w.ndim == 3:
            if target_grid is not None:
                w = interpolate_pos_embed(w, target_grid)
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
            note(key)
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
        else:
            note(key)
    return params
