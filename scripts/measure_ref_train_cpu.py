"""Measure ONE reference (torch) TBSRN + text-focus TRAIN step on this CPU.

Anchors bench_train.py's vs_baseline the same way BASELINE.md anchors the
inference denominator: a measured reference-code rate on THIS host, scaled
to a V100 estimate through the shared FLOP model. Runs the reference's
exact train-step math (scene-text-telescope/interfaces/
super_resolution.py:58-140): TBSRN forward -> TextFocusLoss (two frozen
transformer-oracle forwards + attention-map L1 + confusion-weighted CE)
-> x100 -> backward -> clip 0.25 -> Adam(lr 1e-4, b1 0.5) step.

The reference loss needs two data files we don't have; both only affect
VALUES, not compute shape, so stand-ins are generated:
  * dataset/mydata/confuse.pkl  -> ones (62, 62) matrix
  * dataset/mydata/pretrain_transformer.pth -> a randomly-initialized
    loss Transformer's own state_dict
Weights never matter for timing; the oracle is frozen (eval) either way.

Usage: python scripts/measure_ref_train_cpu.py [batch] [steps]
Prints one JSON line with sec/step and img/s.
"""

import json
import os
import pickle
import sys
import tempfile
import time
import types

import numpy as np
import torch

REF = "/root/reference/scene-text-telescope"
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    # cuda -> cpu no-ops (the reference hardcodes .cuda() everywhere)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    tmp = tempfile.mkdtemp(prefix="ref_train_")
    os.makedirs(os.path.join(tmp, "dataset", "mydata"), exist_ok=True)
    with open(os.path.join(tmp, "dataset", "mydata", "confuse.pkl"),
              "wb") as f:
        pickle.dump(np.ones((62, 62), np.float64), f)

    sys.path.insert(0, REF)
    os.chdir(tmp)  # the loss loads ./dataset/mydata/* relative paths
    from loss.transformer import Transformer  # noqa: E402

    oracle = torch.nn.DataParallel(Transformer())
    torch.save(oracle.state_dict(),
               os.path.join(tmp, "dataset", "mydata",
                            "pretrain_transformer.pth"))

    from loss.text_focus_loss import TextFocusLoss  # noqa: E402
    from model.tbsrn import TBSRN  # noqa: E402

    torch.manual_seed(0)
    model = TBSRN(scale_factor=2, width=128, height=32, STN=True,
                  srb_nums=5, hidden_units=32).train()
    crit = TextFocusLoss(types.SimpleNamespace(text_focus=True))
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, betas=(0.5, 0.999))

    rng = np.random.default_rng(0)
    lr_imgs = torch.from_numpy(
        rng.random((BATCH, 3, 16, 64), np.float32))
    hr_imgs = torch.from_numpy(
        rng.random((BATCH, 3, 32, 128), np.float32))
    labels = ["word%02d" % i for i in range(BATCH)]

    def step():
        sr = model(lr_imgs)
        loss, *_ = crit(sr, hr_imgs, labels)
        loss = loss * 100
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 0.25)
        opt.step()
        return float(loss)

    step()  # warm (allocator, first autograd graph)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({
        "metric": "reference_tbsrn_textfocus_train_cpu",
        "sec_per_step": round(dt, 3),
        "batch": BATCH,
        "img_per_sec": round(BATCH / dt, 4),
        "torch": torch.__version__,
        "cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
