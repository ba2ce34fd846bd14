"""Unified config system.

The reference carries three generations of config machinery (YAML+argparse in
scene-text-telescope/main.py:17-40, plain python dicts in */config.py, and
mmcv Config _base_ inheritance in text-focused-Transformers/tools/train.py:113).
Here there is one: a dict-backed `Config` with attribute access, YAML loading,
`_base_`-style inheritance, and dotted-key CLI overrides — so every app's
entry point shares a single mechanism.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """Dict with attribute access and recursive wrapping (EasyDict-alike)."""

    def __init__(self, d: Optional[Dict[str, Any]] = None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, Config):
            return Config(v)
        if isinstance(v, (list, tuple)):
            return type(v)(Config._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, Config._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.items():
            if isinstance(v, Config):
                v = v.to_dict()
            elif isinstance(v, (list, tuple)):
                v = type(v)(x.to_dict() if isinstance(x, Config) else x for x in v)
            out[k] = v
        return out


def _deep_merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: str) -> Config:
    """Load a YAML config, resolving `_base_` inheritance (mmcv-style).

    `_base_` may be a string or list of strings, relative to the config file.
    Later bases and the file itself override earlier ones.
    """
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    bases = raw.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for b in bases:
        bpath = b if os.path.isabs(b) else os.path.join(os.path.dirname(path), b)
        merged = _deep_merge(merged, load_config(bpath).to_dict())
    merged = _deep_merge(merged, raw)
    return Config(merged)


def merge_cli_overrides(cfg: Config, overrides: List[str]) -> Config:
    """Apply `key.subkey=value` overrides (mmcv --cfg-options equivalent)."""
    cfg = copy.deepcopy(cfg)
    for item in overrides:
        key, _, val = item.partition("=")
        val = yaml.safe_load(val)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node:
                node[p] = Config()
            node = node[p]
        node[parts[-1]] = val
    return cfg
