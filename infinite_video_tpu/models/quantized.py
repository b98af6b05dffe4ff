"""Int8 weight-only quantization for the decoder (serving memory/bandwidth).

A bf16 7B decoder is ~14 GB — at the edge of a single v5e's 16 GB HBM and
memory-bound at decode time. Weight-only int8 (per-output-channel symmetric
scales) halves both, with activations and accumulation kept in bf16/fp32.

`quantize_decoder_params` rewrites a Decoder param tree: every targeted 2-D
kernel becomes {kernel_q: int8 [in, out], scale: f32 [out]}; embedding and
norms stay high precision. The model itself is the unified
`models.decoder.Decoder` with `DecoderConfig.quantized=True` (same attention,
cache, flash/remat paths — no duplicated architecture); `QuantDecoder(cfg)`
is a convenience constructor.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict

import jax
import numpy as np

from infinite_video_tpu.models.decoder import Decoder, DecoderConfig, QuantDense

__all__ = ["quantize_decoder_params", "fuse_decoder_params", "QuantDecoder",
           "QuantDense", "QUANT_TARGETS"]

QUANT_TARGETS = (r".*(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|"
                 r"down_proj|lm_head)/kernel$")


def QuantDecoder(cfg: DecoderConfig, bits: int = 8) -> Decoder:
    """The unified Decoder with int8 (or int4-grouped) projections enabled."""
    return Decoder(dataclasses.replace(cfg, quantized=True, quant_bits=bits))


def fuse_decoder_params(params: Dict, qkv: bool = True,
                        mlp: bool = True) -> Dict:
    """Rewrite layer trees for `DecoderConfig.fused_proj`/`fused_mlp`: q/k/v
    kernels concatenate (on the output axis) into qkv_proj and gate/up into
    gateup_proj. Column-wise the fused matmul computes the identical dots, so
    logits are bit-equal to the unfused layout (tested). Works on fp trees
    ({kernel}) and int8 trees ({kernel_q, scale} — per-output-channel scales
    concatenate right along)."""
    import copy

    out = copy.copy(params)
    for name, layer in params.items():
        if not (isinstance(layer, dict) and "q_proj" in layer):
            continue
        layer = dict(layer)

        def fuse(parts_names, fused_name):
            parts = [layer.pop(p) for p in parts_names]
            keys = parts[0].keys()
            layer[fused_name] = {
                k: np.concatenate([np.asarray(p[k]) for p in parts],
                                  axis=-1) for k in keys}

        if qkv:
            fuse(("q_proj", "k_proj", "v_proj"), "qkv_proj")
        if mlp:
            fuse(("gate_proj", "up_proj"), "gateup_proj")
        out[name] = layer
    return out


def quantize_decoder_params(params: Dict, targets: str = QUANT_TARGETS,
                            bits: int = 8, group_size: int = 128) -> Dict:
    """fp kernel [in, out] -> quantized weights on target paths.

    bits=8: {kernel_q int8, scale f32[out]} — per-output-channel symmetric.
    bits=4: {kernel_q int4, scale f32[ceil(in/g), out]} — per-(input-group,
    output-channel) symmetric scales (AWQ/GPTQ-style grouping, g=group_size);
    the finer scale granularity is what keeps 4-bit usable."""
    assert bits in (8, 4), bits
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: Dict = {}

    def put(path_parts, value):
        node = out
        for p in path_parts[:-1]:
            node = node.setdefault(p, {})
        node[path_parts[-1]] = value

    for path, leaf in flat:
        parts = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        p = "/".join(parts)
        if re.match(targets, p) and leaf.ndim == 2:
            w = np.asarray(leaf, np.float32)
            if bits == 8:
                scale = np.abs(w).max(axis=0) / 127.0
                scale = np.maximum(scale, 1e-8)
                q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            else:
                kin, kout = w.shape
                g = min(group_size, kin)
                pad = (-kin) % g
                wp = np.pad(w, ((0, pad), (0, 0)))
                wg = wp.reshape(-1, g, kout)                 # [G, g, out]
                scale = np.abs(wg).max(axis=1) / 7.0         # [G, out]
                scale = np.maximum(scale, 1e-8)
                q = np.clip(np.round(wg / scale[:, None, :]), -8, 7)
                q = q.reshape(-1, kout)[:kin].astype(np.int8)
                # pack two int4 nibbles per byte, HALF-SPLIT along the input
                # dim: byte[i] = (q[i + K/2] << 4) | (q[i] & 0xF). The Pallas
                # decode kernel (ops/pallas/quant_matmul.py::quant_matmul_int4)
                # reads each byte once and contracts both halves in the same
                # block visit — interleaved packing would force strided
                # shuffles, and an XLA-level unpack materializes the full
                # dequantized matrix (measured 5.7 tok/s vs ~91 for int8).
                if kin % 2:
                    q = np.pad(q, ((0, 1), (0, 0)))
                k2 = q.shape[0] // 2
                q16 = q.astype(np.int16)
                q = ((q16[k2:] << 4) | (q16[:k2] & 0xF)).astype(np.int8)
            put(parts[:-1] + ["kernel_q"], q)
            put(parts[:-1] + ["scale"], scale.astype(np.float32))
        else:
            put(parts, leaf)
    return out
