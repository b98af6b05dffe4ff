"""torch(HF) → flax weight conversion for the LLaMA/Mistral decoder.

Handles standard HF naming (LlamaForCausalLM / MistralForCausalLM state_dicts,
which is also what the reference's vendored modeling_llama.py uses) and merges
LoRA adapters when present (peft naming, videochat2_it_mistral.py:149-158):
W_merged = W + (alpha/r) * B @ A.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

__all__ = ["convert_decoder_state_dict", "merge_lora"]


def _to_np(w):
    return np.asarray(w.detach().to("cpu").float().numpy()
                      if hasattr(w, "detach") else w, dtype=np.float32)


def _canon(key: str) -> str:
    """Strip peft/wrapper prefixes so adapter keys match HF base names.

    Real stage-3 checkpoints name adapters
    `mistral_model.base_model.model.model.layers...` while the base weights
    use `model.layers...` (videochat2_it_mistral.py wraps with get_peft_model).
    """
    for pre in ("mistral_model.", "llama_model.", "phi_model."):
        if key.startswith(pre):
            key = key[len(pre):]
    if key.startswith("base_model.model."):
        key = key[len("base_model.model."):]
    return key.replace(".base_layer.", ".")


def merge_lora(state_dict, lora_alpha: float, r: int) -> Dict:
    """Fold peft LoRA weights into their base matrices.

    peft names: `...<proj>.lora_A.weight` [r, in], `...<proj>.lora_B.weight`
    [out, r], base at `...<proj>.base_layer.weight` (or plain `.weight`).
    Keys are canonicalised (peft wrapper prefixes stripped) before matching,
    so adapters from a wrapped checkpoint merge into HF-named base weights.
    """
    out = {}
    lora_a, lora_b = {}, {}
    for k, w in state_dict.items():
        ck = _canon(k)
        if ".lora_A." in ck:
            lora_a[ck.split(".lora_A.")[0]] = _to_np(w)
        elif ".lora_B." in ck:
            lora_b[ck.split(".lora_B.")[0]] = _to_np(w)
        else:
            out[ck] = w
    scale = lora_alpha / r
    for base, A in lora_a.items():
        B = lora_b[base]
        key = f"{base}.weight"
        if key not in out:
            raise KeyError(f"LoRA adapter '{base}' has no base weight "
                           f"'{key}' in the merged state dict")
        out[key] = _to_np(out[key]) + scale * (B @ A)
    return out


def convert_decoder_state_dict(state_dict, unconsumed: list | None = None) -> Dict:
    """`unconsumed` optionally collects source keys that mapped to no
    parameter (rotary inv_freq buffers are intentional skips)."""
    params: Dict = {}

    def put(path, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v

    def note(key):
        if unconsumed is not None and "rotary_emb.inv_freq" not in key:
            unconsumed.append(key)

    for key, w in state_dict.items():
        k = key
        for pre in ("base_model.model.", "llama_model.", "mistral_model.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k == "embed_tokens.weight":
            put(("embed_tokens", "embedding"), _to_np(w))
        elif k == "norm.weight":
            put(("final_ln", "weight"), _to_np(w))
        elif k == "lm_head.weight":
            put(("lm_head", "kernel"), np.ascontiguousarray(_to_np(w).T))
        else:
            m = re.match(r"layers\.(\d+)\.(.+)", k)
            if not m:
                note(key)
                continue
            i, rest = int(m.group(1)), m.group(2)
            lp = (f"layer_{i}",)
            if rest == "input_layernorm.weight":
                put(lp + ("input_ln", "weight"), _to_np(w))
            elif rest == "post_attention_layernorm.weight":
                put(lp + ("post_ln", "weight"), _to_np(w))
            else:
                m2 = re.match(r"(self_attn|mlp)\.(\w+_proj)\.weight", rest)
                if m2:
                    put(lp + (m2.group(2), "kernel"),
                        np.ascontiguousarray(_to_np(w).T))
                else:
                    note(key)
    return params
