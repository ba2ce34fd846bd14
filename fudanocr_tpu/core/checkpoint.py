"""Checkpointing.

One format for every sub-project (the reference has three:
state_dict_G dicts for SR, bare state_dicts for CTR, mmcv runner
checkpoints — interfaces/base.py:255-272, sld/train.py:83,
tools/train.py:229-240). A checkpoint is a directory with:

  state.msgpack   — flax-serialized pytree (params / batch_stats / opt_state)
  meta.json       — step, arch info, best metrics, converge history

`save` writes atomically (tmp dir + rename) so a preempted TPU job never
leaves a half-written checkpoint; `load` restores onto a pytree template.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Dict, Optional

import flax.serialization


def save(path: str, tree: Any, meta: Optional[Dict] = None) -> None:
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix=".ckpt_tmp_")
    try:
        with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(tree))
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta or {}, f, indent=1, default=str)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def load(path: str, template: Any) -> Any:
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def load_meta(path: str) -> Dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def latest(ckpt_dir: str, prefix: str = "") -> Optional[str]:
    """Most recent checkpoint subdirectory (auto-resume support,
    mmseg/apis/train.py:186-191 equivalent). `prefix` restricts the scan
    (e.g. 'iter_' to skip a params-only 'best' checkpoint whose tree
    would not match a full-state template)."""
    if not os.path.isdir(ckpt_dir):
        return None
    subs = [d for d in os.listdir(ckpt_dir)
            if os.path.isdir(os.path.join(ckpt_dir, d))
            and d.startswith(prefix)
            and os.path.exists(os.path.join(ckpt_dir, d, "meta.json"))]
    if not subs:
        return None

    def step_of(d):
        try:
            return load_meta(os.path.join(ckpt_dir, d)).get("step", -1)
        except Exception:
            return -1

    return os.path.join(ckpt_dir, max(subs, key=step_of))
