"""Generate golden fixtures for the ViTs by driving the reference code.

timm isn't installed; we stub the three helpers the reference imports
(drop_path / to_2tuple / trunc_normal_ / register_model) — all are inert at
eval time with drop_path_rate=0. Small configs keep fixtures light; the
architecture code paths are identical to full size.

Usage: python tools/gen_golden_vit.py
"""

import importlib.util
import itertools
import os
import sys
import types

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def _stub_modules():
    from importlib.machinery import ModuleSpec

    def _mod(name):
        m = types.ModuleType(name)
        # a real spec keeps importlib.util.find_spec(name) working for code
        # (e.g. transformers.utils.import_utils) that probes sys.modules later
        m.__spec__ = ModuleSpec(name, loader=None)
        return m

    timm = _mod("timm")
    models = _mod("timm.models")
    layers = _mod("timm.models.layers")
    registry = _mod("timm.models.registry")

    def drop_path(x, drop_prob=0.0, training=False):
        return x

    def to_2tuple(x):
        return tuple(itertools.repeat(x, 2))

    layers.drop_path = drop_path
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    registry.register_model = lambda f: f
    for name, mod in [("timm", timm), ("timm.models", models),
                      ("timm.models.layers", layers),
                      ("timm.models.registry", registry)]:
        sys.modules.setdefault(name, mod)

    dist_utils = _mod("InfVideoLLaMA.common.dist_utils")
    dist_utils.download_cached_file = lambda *a, **k: None
    for name in ("InfVideoLLaMA", "InfVideoLLaMA.common", "InfVideoLLaMA.models"):
        m = _mod(name)
        m.__path__ = []
        sys.modules.setdefault(name, m)
    sys.modules["InfVideoLLaMA.common.dist_utils"] = dist_utils

    easydict = _mod("easydict")

    class EasyDict(dict):
        __getattr__ = dict.__getitem__

    easydict.EasyDict = EasyDict
    sys.modules.setdefault("easydict", easydict)


def _load(path, modname):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def gen_eva():
    eva = _load("/root/reference/infty-Video-LLaMA/InfVideoLLaMA/models/eva_vit.py",
                "_ref_eva_vit")
    torch.manual_seed(3)
    model = eva.VisionTransformer(
        img_size=56, patch_size=14, embed_dim=64, depth=3, num_heads=4,
        mlp_ratio=4.3637, qkv_bias=True, use_mean_pooling=False,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
    )
    model.eval()
    x = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        y = model(x)
    np.savez_compressed(
        os.path.join(OUT, "vit_eva_small.npz"),
        x=x.numpy(), y=y.numpy(),
        **{k: v.numpy() for k, v in model.state_dict().items()},
    )
    print("wrote vit_eva_small:", y.shape)


def gen_umt(num_frames, ckpt_num_frame, tag):
    vit = _load("/root/reference/infty-VideoChat2/models/blip2/vit.py", f"_ref_umt_{tag}")
    torch.manual_seed(4)
    model = vit.PretrainVisionTransformer(
        img_size=224, patch_size=16, encoder_embed_dim=48, encoder_depth=2,
        encoder_num_heads=4, mlp_ratio=4.0, qkv_bias=True, num_frames=num_frames,
        tubelet_size=1, ckpt_num_frame=ckpt_num_frame, with_ln=True, return_index=-1,
    )
    model.eval()
    x = torch.randn(1, 3, num_frames, 224, 224) * 0.5
    with torch.no_grad():
        y = model(x)  # [B, T, L, C]
    np.savez_compressed(
        os.path.join(OUT, f"vit_umt_{tag}.npz"),
        x=x.numpy(), y=y.numpy(),
        num_frames=num_frames, ckpt_num_frame=ckpt_num_frame,
        **{k: v.numpy() for k, v in model.state_dict().items()},
    )
    print(f"wrote vit_umt_{tag}:", y.shape)


def main():
    os.makedirs(OUT, exist_ok=True)
    _stub_modules()
    gen_eva()
    gen_umt(num_frames=4, ckpt_num_frame=4, tag="t4")
    gen_umt(num_frames=8, ckpt_num_frame=4, tag="t8interp")


if __name__ == "__main__":
    main()
