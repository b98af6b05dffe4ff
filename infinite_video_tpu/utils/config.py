"""Config system: YAML / JSON / python files, `_base_` inheritance, dotlist
CLI overrides, attribute access.

Unifies the reference's two config stacks:
  - LAVIS OmegaConf YAML merge + `--options` dotlist
    (InfVideoLLaMA/common/config.py:16-100)
  - VideoChat2 importable .py configs with `_base_` inheritance and `${var}`
    lazy interpolation (infty-VideoChat2/utils/config.py:22-90,
    utils/config_utils.py:14-31)
"""

from __future__ import annotations

import ast
import copy
import importlib.util
import json
import os
from typing import Any, Dict, List, Mapping, Optional, Sequence

__all__ = ["Config", "load_config", "apply_overrides"]


class Config(dict):
    """dict with attribute access and recursive wrapping."""

    def __init__(self, data: Optional[Mapping] = None, **kw):
        super().__init__()
        for k, v in {**(data or {}), **kw}.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, Mapping) and not isinstance(v, Config):
            v = Config(v)
        elif isinstance(v, list):
            v = [Config(x) if isinstance(x, Mapping) and not isinstance(x, Config)
                 else x for x in v]
        super().__setitem__(k, v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        return super().get(k, default)

    def to_dict(self) -> Dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, Config) else x for x in v]
            else:
                out[k] = v
        return out

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))


def _merge(base: Dict, update: Mapping) -> Dict:
    for k, v in update.items():
        if isinstance(v, Mapping) and isinstance(base.get(k), Mapping):
            _merge(base[k], v)
        else:
            base[k] = v
    return base


def _load_py(path: str) -> Dict:
    spec = importlib.util.spec_from_file_location(
        "_cfg_" + os.path.basename(path).replace(".", "_"), path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return {k: v for k, v in vars(mod).items()
            if not k.startswith("_") and not callable(v)
            and not isinstance(v, type(os))}


def _load_raw(path: str) -> Dict:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        with open(path) as f:
            return json.load(f)
    if ext in (".yaml", ".yml"):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f) or {}
    if ext == ".py":
        return _load_py(path)
    raise ValueError(f"unsupported config extension: {path}")


def load_config(path: str, overrides: Optional[Sequence[str]] = None) -> Config:
    """Load with `_base_` inheritance (string or list of relative paths),
    then apply "a.b.c=value" dotlist overrides."""
    raw = _load_raw(path)
    bases = raw.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict = {}
    for b in bases:
        bpath = os.path.normpath(os.path.join(os.path.dirname(path), b))
        _merge(merged, load_config(bpath).to_dict())
    _merge(merged, raw)
    cfg = Config(merged)
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def _parse_value(s: str) -> Any:
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def apply_overrides(cfg: Config, dotlist: Sequence[str]) -> Config:
    """Apply ["model.alpha=0.5", "run.num_beams=1"]-style overrides in place."""
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override must be key=value: {item!r}")
        key, val = item.split("=", 1)
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], Config):
                node[p] = Config()
            node = node[p]
        node[parts[-1]] = _parse_value(val)
    return cfg
