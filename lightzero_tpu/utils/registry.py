"""Named registries for envs / policies / models / buffers.

Replaces the role of ding's ``ENV_REGISTRY`` / ``POLICY_REGISTRY``
(reference ``create_policy`` factory, lzero/entry/train_muzero.py:94) with a
minimal decorator-based registry.
"""
from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._d: Dict[str, Any] = {}

    def register(self, key: str) -> Callable:
        def deco(obj):
            if key in self._d and self._d[key] is not obj:
                raise KeyError(f"{self.name}: duplicate key {key!r}")
            self._d[key] = obj
            return obj

        return deco

    def get(self, key: str) -> Any:
        if key not in self._d:
            raise KeyError(
                f"{self.name}: unknown key {key!r}; registered: {sorted(self._d)}"
            )
        return self._d[key]

    def build(self, key: str, *args, **kwargs) -> Any:
        return self.get(key)(*args, **kwargs)

    def keys(self):
        return self._d.keys()

    def __contains__(self, key: str) -> bool:
        return key in self._d


ENV_REGISTRY = Registry("env")
POLICY_REGISTRY = Registry("policy")
MODEL_REGISTRY = Registry("model")
BUFFER_REGISTRY = Registry("buffer")
