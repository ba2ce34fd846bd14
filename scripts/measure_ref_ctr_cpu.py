"""Measure ONE reference (torch) SLD CTR TRAIN step on this CPU.

Anchors bench_ctr.py's vs_baseline the same way measure_ref_train_cpu.py
anchors bench_train.py's: a measured reference-code rate on THIS host,
scaled to a V100 estimate through the shared FLOP model (see
"REF_GPU_CTR_TRAIN_IPS derivation" in BASELINE.md). Runs the reference's
exact train-step math (stroke-level-decomposition/train.py:63-77):
Transformer('stroke') forward (ResNet[3,4,6,3] encoder + 1-layer decoder)
-> CE(probs_res, text_gt) -> backward -> Adadelta(lr 1.0, rho 0.9) step,
at the reference recipe (config.py: batch 32, image 32x32, stroke mode).

The reference modules import `lmdb` and `Levenshtein` (absent here) at
module scope; both are stubbed — neither affects the timed math.

Usage: python scripts/measure_ref_ctr_cpu.py [batch] [steps]
Prints one JSON line with sec/step and img/s.
"""

import json
import os
import sys
import time
import types

import numpy as np
import torch

REF = "/root/reference/stroke-level-decomposition"
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    # cuda -> cpu no-ops (the reference hardcodes .cuda() everywhere)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # absent-on-this-host imports used only by the data/eval paths
    # (torchvision is imported by model/transformer.py but never called)
    for name in ("lmdb", "Levenshtein", "torchvision",
                 "torchvision.models", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["Levenshtein"].distance = lambda a, b: 0
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].transforms = (
        sys.modules["torchvision.transforms"])

    sys.path.insert(0, REF)
    os.chdir(REF)  # util.py reads ./data/decompose-stroke-3755.txt
    from model.transformer import Transformer  # noqa: E402
    from util import converter  # noqa: E402

    torch.manual_seed(0)
    model = Transformer("stroke").train()
    criterion = torch.nn.CrossEntropyLoss()
    opt = torch.optim.Adadelta(model.parameters(), lr=1.0, rho=0.9)

    rng = np.random.default_rng(0)
    image = torch.from_numpy(rng.random((BATCH, 3, 32, 32), np.float32))
    # labels: chars from the stroke table, like the LMDB reader yields
    import util as u  # noqa: E402
    chars = list(u.character_to_strokelist)[:BATCH]
    length, text_input, text_gt, _ = converter("stroke", chars)

    def step():
        opt.zero_grad()
        result = model(image, length, text_input)
        loss = criterion(result["pred"], text_gt)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warm (allocator, first autograd graph)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({
        "metric": "reference_sld_ctr_train_cpu",
        "sec_per_step": round(dt, 3),
        "batch": BATCH,
        "img_per_sec": round(BATCH / dt, 4),
        "torch": torch.__version__,
        "cpus": os.cpu_count(),
    }))

    # ---- reference autoregressive eval loop (train.py:110-121): 30 calls
    # of model(image, len=i+1, pred_prefix, conv_feature=cache, test=True),
    # conv features cached after the first call ----
    model.eval()
    max_length = 30

    @torch.no_grad()
    def decode():
        pred = torch.zeros(BATCH, 1).long()
        feats = None
        for i in range(max_length):
            ln = torch.zeros(BATCH).long() + i + 1
            result = model(image, ln, pred, conv_feature=feats, test=True)
            now = torch.max(torch.softmax(result["pred"], 2), 2)[1]
            pred = torch.cat((pred, now[:, -1].view(-1, 1)), 1)
            feats = result["conv"]
        return pred

    decode()  # warm
    t0 = time.perf_counter()
    for _ in range(max(1, STEPS // 3)):
        decode()
    dt = (time.perf_counter() - t0) / max(1, STEPS // 3)
    print(json.dumps({
        "metric": "reference_sld_ctr_decode30_cpu",
        "sec_per_batch": round(dt, 3),
        "batch": BATCH,
        "img_per_sec": round(BATCH / dt, 4),
        "torch": torch.__version__,
        "cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
