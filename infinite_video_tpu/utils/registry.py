"""Name → class registry (LAVIS-style).

Port of `InfVideoLLaMA/common/registry.py:9+`: models, processors, tasks and
dataset builders register under string names resolved by the config system
(model `arch:` fields, processor `name:` fields).
"""

from __future__ import annotations

from typing import Callable, Dict, Type

__all__ = ["registry"]


class _Registry:
    def __init__(self):
        self._groups: Dict[str, Dict[str, Type]] = {
            "model": {}, "processor": {}, "task": {}, "builder": {},
            "lr_scheduler": {},
        }

    def _register(self, group: str, name: str) -> Callable:
        def deco(cls):
            existing = self._groups[group].get(name)
            if existing is not None and existing is not cls:
                raise KeyError(f"{group} '{name}' already registered to {existing}")
            self._groups[group][name] = cls
            return cls
        return deco

    def register_model(self, name: str):
        return self._register("model", name)

    def register_processor(self, name: str):
        return self._register("processor", name)

    def register_task(self, name: str):
        return self._register("task", name)

    def register_builder(self, name: str):
        return self._register("builder", name)

    def register_lr_scheduler(self, name: str):
        return self._register("lr_scheduler", name)

    def get_model_class(self, name: str):
        return self._groups["model"][name]

    def get_processor_class(self, name: str):
        return self._groups["processor"][name]

    def get_task_class(self, name: str):
        return self._groups["task"][name]

    def get_builder_class(self, name: str):
        return self._groups["builder"][name]

    def get_lr_scheduler_class(self, name: str):
        return self._groups["lr_scheduler"][name]

    def list(self, group: str):
        return sorted(self._groups[group])


registry = _Registry()
