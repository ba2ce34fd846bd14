"""Export fudanocr_tpu checkpoints BACK to reference torch state_dicts.

The forward porters (utils/torch_port.py) let reference users bring their
.pth weights here; this module closes the loop so models trained or
fine-tuned on TPU can be handed back to the reference tooling
(scene-text-telescope/interfaces/base.py:255-272 expects plain
state_dicts / state_dict_G payloads).

No per-model reverse code is written. Every converter in torch_port is a
pure PERMUTATION of elements — transposes, concatenations, reshapes,
slices; never arithmetic — so its inverse is recovered mechanically:

1. tag every element of a template state_dict with its global flat
   position (int64 index arrays of the original shapes),
2. run the forward porter once over those index arrays; the resulting
   flax tree now stores, at each position, WHICH template element feeds
   it,
3. scatter the real flax checkpoint values back through that mapping.

Keys the porter never reads (e.g. BatchNorm num_batches_tracked) keep
their template values. A porter leaf that is not an int64 index array
(i.e. a value synthesized rather than moved) fails loudly — none exist
today, and silently exporting garbage would be worse than refusing.

CLI:  python -m fudanocr_tpu.utils.torch_export <model> <ckpt_dir> \
          <template.pth> <out.pth>
where <template.pth> is any reference checkpoint of the same
architecture (only its keys/shapes/dtypes are used).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Tuple

import numpy as np

from fudanocr_tpu.utils.torch_port import PORTERS


def _np_dtype(v) -> np.dtype:
    """numpy dtype of a torch tensor / array, mapping torch-only dtypes
    (bfloat16) through ml_dtypes."""
    if not hasattr(v, "detach"):
        return np.asarray(v).dtype
    name = str(v.dtype).replace("torch.", "")
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # ships with jax
        return np.dtype(getattr(ml_dtypes, name))


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        t = v.detach().cpu()
        try:
            return t.numpy()
        except TypeError:  # torch dtype numpy can't view (bfloat16)
            return t.float().numpy().astype(_np_dtype(v))
    return np.asarray(v)


def _walk(tree, path=()) -> Iterator[Tuple[Tuple[str, ...], Any]]:
    """Depth-first (path, leaf) pairs over nested mappings."""
    if hasattr(tree, "items"):
        for k in sorted(tree.keys()):
            yield from _walk(tree[k], path + (str(k),))
    else:
        yield path, tree


def trace_porter(model: str, template_sd: Dict[str, Any], **porter_kwargs):
    """Run porter `model` over index-coded arrays.

    Returns (idx_tree, key_meta, total) where idx_tree mirrors the flax
    variables tree with int64 source-index leaves and key_meta maps each
    ORIGINAL template key to (offset, shape, numpy dtype)."""
    porter = PORTERS[model]
    key_meta: Dict[str, Tuple[int, Tuple[int, ...], np.dtype]] = {}
    off = 0
    for k, v in template_sd.items():
        shape = tuple(v.shape) if hasattr(v, "shape") else np.shape(v)
        key_meta[k] = (off, shape, _np_dtype(v))
        off += int(np.prod(shape, dtype=np.int64)) if shape else 1
    # one global index vector, sliced per key (views — no per-key allocs);
    # int32 halves the traffic and covers any model here
    idx_dtype = np.int32 if off < 2 ** 31 else np.int64
    base = np.arange(off, dtype=idx_dtype)
    sd_idx = {k: base[o:o + int(np.prod(s, dtype=np.int64) if s else 1)]
              .reshape(s) for k, (o, s, _) in key_meta.items()}
    idx_tree = porter(sd_idx, **porter_kwargs)
    return idx_tree, key_meta, off


def export_state_dict(model: str, variables, template_sd: Dict[str, Any],
                      **porter_kwargs) -> Dict[str, np.ndarray]:
    """Invert PORTERS[model]: flax `variables` -> torch-layout state_dict.

    `template_sd` supplies the key set, shapes and dtypes (any checkpoint
    of the same architecture). Output values are numpy arrays in the
    template dtypes, under the template's ORIGINAL key names (including
    any DataParallel 'module.' prefix). Unread template keys pass through
    unchanged."""
    idx_tree, key_meta, total = trace_porter(model, template_sd,
                                             **porter_kwargs)

    idx_leaves = dict(_walk(idx_tree))
    val_leaves = dict(_walk(variables))
    missing = sorted(set(idx_leaves) - set(val_leaves))
    extra = sorted(set(val_leaves) - set(idx_leaves))
    if missing or extra:
        raise ValueError(
            f"flax tree does not match porter output for {model!r}: "
            f"missing={missing[:5]} extra={extra[:5]}")

    flat = np.zeros((total,), np.float64)
    filled = np.zeros((total,), bool)
    for path, idx in idx_leaves.items():
        idx = np.asarray(idx)
        if idx.dtype not in (np.int32, np.int64):
            raise ValueError(
                f"porter leaf {'/'.join(path)} synthesizes values instead "
                "of moving template elements; it cannot be auto-inverted")
        val = np.asarray(val_leaves[path], np.float64)
        if val.shape != idx.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: checkpoint "
                f"{val.shape} vs template-derived {idx.shape}")
        ids = idx.ravel()
        vals = val.ravel()
        # ambiguity guards: a template element feeding two positions (within
        # this leaf or across leaves) is only exportable if both positions
        # still carry one value
        if np.unique(ids).size != ids.size:  # intra-leaf tile/broadcast
            order = np.argsort(ids, kind="stable")
            si, sv = ids[order], vals[order]
            ok = (si[1:] != si[:-1]) | (sv[1:] == sv[:-1])
            if not ok.all():
                raise ValueError(
                    f"leaf {'/'.join(path)} maps one template element to "
                    "several different values; refusing ambiguous export")
        dup = filled[ids]
        if dup.any():
            prev = flat[ids[dup]]
            if not np.array_equal(prev, vals[dup]):
                raise ValueError(
                    f"leaf {'/'.join(path)} re-writes template elements "
                    "with different values (porter duplicates a tensor); "
                    "refusing ambiguous export")
        flat[ids] = vals
        filled[ids] = True

    out: Dict[str, np.ndarray] = {}
    for k, (off, shape, dtype) in key_meta.items():
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        got = filled[off:off + n]
        if got.all():
            out[k] = np.ascontiguousarray(
                flat[off:off + n].reshape(shape).astype(dtype, copy=False))
        elif not got.any():          # porter never read it: pass through
            out[k] = _to_np(template_sd[k]).copy()
        else:
            raise ValueError(f"template key {k!r} only partially mapped "
                             f"({int(got.sum())}/{n} elements)")
    return out


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="export a fudanocr_tpu checkpoint directory back to a "
                    "reference torch state_dict")
    p.add_argument("model", choices=sorted(PORTERS))
    p.add_argument("ckpt_dir")
    p.add_argument("template_pth", help="reference .pth of the same "
                   "architecture (keys/shapes/dtypes only)")
    p.add_argument("out_pth")
    args = p.parse_args(argv)

    import torch

    from fudanocr_tpu.core import checkpoint as ckpt_lib

    template = torch.load(args.template_pth, map_location="cpu")
    wrap_g = isinstance(template, dict) and "state_dict_G" in template
    sd = template["state_dict_G"] if wrap_g else template

    # the porter output doubles as the load template for the flax ckpt
    tree = PORTERS[args.model](sd)
    variables = ckpt_lib.load(args.ckpt_dir, tree)
    out_sd = export_state_dict(args.model, variables, sd)
    out_t = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in out_sd.items()}
    torch.save({"state_dict_G": out_t} if wrap_g else out_t, args.out_pth)
    print(f"wrote {args.out_pth}")


if __name__ == "__main__":
    main()
