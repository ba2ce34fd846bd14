"""Measure ONE reference (torch) CCR-CLIP pretrain step on this CPU.

Anchors bench_clip.py's vs_baseline via the usual protocol (BASELINE.md
"REF_GPU_CLIP_* derivation"): a measured reference-code rate on THIS
host, scaled to a V100 estimate through the shared FLOP model. The timed
math is the reference's stage-1 hot loop
(image-ids-CTR/CCR-CLIP/main.py:82-116):

  CLIP(RN50 visual + 12L w=512 text transformer, embed 2048) forward on
  (batch 128 images @128x128, 30-token radical sequences)
  -> logit_scale * img @ txt.T -> symmetric CE (first-occurrence gt)
  -> backward -> Adam(1e-4, (0.9, 0.98)) step.

Also times the zero-shot-retrieval gallery encode (val(): 3755 chars'
text features in chunks of 100, main.py:33-78).

Usage: python scripts/measure_ref_clip_cpu.py [batch] [steps]
Prints one JSON line per metric.
"""

import json
import os
import sys
import time

import torch
import torch.nn as nn

REF = "/root/reference/image-ids-CTR/CCR-CLIP"
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    sys.path.insert(0, REF)
    os.chdir(REF)  # model.py does `from resnet50 import ...` relatively
    from model import CLIP  # noqa: E402

    alphabet = open("data/radical_alphabet_27533_benchmark.txt",
                    encoding="utf-8").read()
    vocab = len(alphabet) + 3  # utils.get_alphabet appends specials

    torch.manual_seed(0)
    # the vendored model.py hardcodes the RN50 visual tower; its CLIP
    # signature drops main.py's vision_* kwargs (model.py:135-143)
    model = CLIP(embed_dim=2048, context_length=30, vocab_size=vocab,
                 transformer_width=512, transformer_heads=8,
                 transformer_layers=12).train()
    loss_img = nn.CrossEntropyLoss()
    loss_txt = nn.CrossEntropyLoss()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, betas=(0.9, 0.98),
                           eps=1e-6)

    g = torch.Generator().manual_seed(0)
    image = torch.rand(BATCH, 3, 128, 128, generator=g)
    # radical token sequences: argmax token (EOT) must be the largest id,
    # as convert() produces (utils.py:55-68)
    text = torch.randint(1, vocab - 1, (BATCH, 30), generator=g)
    text[:, 10] = vocab - 1
    ground_truth = torch.arange(BATCH, dtype=torch.long)

    def step():
        opt.zero_grad()
        image_features, text_features, logit_scale = model(image, text)
        logits_per_image = logit_scale * image_features @ text_features.t()
        logits_per_text = logits_per_image.t()
        total_loss = (loss_img(logits_per_image, ground_truth)
                      + loss_txt(logits_per_text, ground_truth)) / 2
        total_loss.backward()
        opt.step()
        return float(total_loss.detach())

    step()  # warm
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({
        "metric": "reference_ccr_clip_pretrain_cpu",
        "sec_per_step": round(dt, 3),
        "batch": BATCH,
        "img_per_sec": round(BATCH / dt, 4),
        "torch": torch.__version__,
        "cpus": os.cpu_count(),
    }), flush=True)

    # ---- zero-shot gallery encode: 3755 chars in chunks of 100
    # (main.py:44-55) ----
    model.eval()
    gallery_tokens = torch.randint(1, vocab - 1, (3755, 30), generator=g)
    gallery_tokens[:, 10] = vocab - 1

    @torch.no_grad()
    def encode_gallery():
        feats = []
        for s in range(0, 3755, 100):
            feats.append(model.encode_text(gallery_tokens[s:s + 100]))
        return torch.cat(feats)

    encode_gallery()  # warm
    t0 = time.perf_counter()
    encode_gallery()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "reference_ccr_clip_gallery3755_cpu",
        "sec_per_gallery": round(dt, 3),
        "chars_per_sec": round(3755 / dt, 1),
        "torch": torch.__version__,
        "cpus": os.cpu_count(),
    }), flush=True)


if __name__ == "__main__":
    main()
