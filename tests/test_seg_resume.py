"""SegTrainer periodic checkpointing + auto-resume.

Matches the reference runner's CheckpointHook + --auto-resume semantics
(mmseg/apis/train.py:129-193): a run killed mid-training restarts from the
latest periodic checkpoint and — at an epoch-aligned checkpoint boundary —
reproduces the uninterrupted run's final state exactly (full state incl.
optimizer moments and the folded per-iter rng stream)."""

import jax
import jax.numpy as jnp
import numpy as np


def _make_trainer(tmp_path, total_iters, **kw):
    from fudanocr_tpu.data.seg_dataset import SyntheticTextSeg
    from fudanocr_tpu.data.seg_pipeline import Normalize
    from fudanocr_tpu.models.seg import (CascadeMiT, EncoderDecoder,
                                         SegformerHead)
    from fudanocr_tpu.train.seg import SegTrainer

    model = EncoderDecoder(
        backbone=CascadeMiT(embed_dims=8, num_layers=(1, 1, 1, 1),
                            num_heads=(1, 2, 5, 8), drop_path_rate=0.0),
        decode_head=SegformerHead(num_classes=2, channels=32))
    # 8 samples / batch 4 -> 2 batches per epoch; ckpt_every=2 aligns
    # checkpoints with epoch boundaries so the shuffle seed stream of a
    # resumed run matches the uninterrupted one
    data = SyntheticTextSeg(8, (32, 32), [Normalize()], seed=0)
    return SegTrainer(model, data, data, batch_size=4, lr=1e-3,
                      total_iters=total_iters, eval_every=10 ** 9,
                      ckpt_dir=str(tmp_path / "ckpt"), ckpt_every=2,
                      seed=7, **kw)


def test_seg_periodic_checkpoint_and_auto_resume(tmp_path):
    # uninterrupted run: 6 iters
    t_full = _make_trainer(tmp_path / "full", 6)
    t_full.train()
    full_params = jax.device_get(t_full.state.params)

    # interrupted run: same 6-iter recipe, dies after 4 iters (stop_after
    # keeps the lr schedule and the shared jitted step identical to the
    # full run's — like a real mid-run kill, and one compile serves all
    # trainers in this module)
    t_int = _make_trainer(tmp_path / "int", 6)
    t_int.train(stop_after=4)
    ckpts = sorted((tmp_path / "int" / "ckpt").iterdir())
    assert any(p.name.startswith("iter_") for p in ckpts)

    # restart with auto_resume: picks up iter_4 and finishes to 6
    t_res = _make_trainer(tmp_path / "int", 6, auto_resume=True)
    assert t_res.start_iter == 4
    t_res.train()
    res_params = jax.device_get(t_res.state.params)
    assert int(t_res.state.step) == 6

    flat_full = jax.tree_util.tree_leaves(full_params)
    flat_res = jax.tree_util.tree_leaves(res_params)
    for a, b in zip(flat_full, flat_res):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_seg_periodic_checkpoint_pruning(tmp_path):
    t = _make_trainer(tmp_path, 6)    # ckpt_every=2 -> 3 periodic saves
    t.max_keep = 2                    # (same recipe as the resume test —
    t.train()                         # reuses its init/step compiles)
    kept = sorted(d.name for d in (tmp_path / "ckpt").iterdir()
                  if d.name.startswith("iter_"))
    assert kept == ["iter_4", "iter_6"]
