"""Component registries (mini-mmcv).

The reference's segmentation stack builds everything through mmcv registries
(DATASETS/PIPELINES/BACKBONES/HEADS/SEGMENTORS/LOSSES). We keep the idea —
string-keyed factories built from config dicts with a `type` field — without
the mmcv machinery.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._items: Dict[str, Callable] = {}

    def register(self, name: Optional[str] = None):
        def deco(fn):
            key = name or fn.__name__
            if key in self._items:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self._items[key] = fn
            return fn

        return deco

    def get(self, key: str) -> Callable:
        if key not in self._items:
            raise KeyError(
                f"{key!r} not found in registry {self.name}; "
                f"available: {sorted(self._items)}"
            )
        return self._items[key]

    def build(self, cfg: Dict[str, Any], **extra) -> Any:
        """Build from a config dict with a `type` key; extra kwargs override."""
        cfg = dict(cfg)
        kind = cfg.pop("type")
        cfg.update(extra)
        return self.get(kind)(**cfg)

    def keys(self):
        return self._items.keys()

    def __contains__(self, key):
        return key in self._items


MODELS = Registry("models")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
LOSSES = Registry("losses")
BACKBONES = Registry("backbones")
HEADS = Registry("heads")
SEGMENTORS = Registry("segmentors")
