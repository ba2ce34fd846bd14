"""Measure ONE reference (torch) cascade-B0 segmentation TRAIN step on CPU.

Anchors bench_seg.py's train-row vs_baseline the same way
measure_ref_train_cpu.py / measure_ref_ctr_cpu.py anchor the SR/CTR
benches: a measured reference-code rate on THIS host, scaled to a V100
estimate through the shared FLOP model (see "REF_GPU_SEG_TRAIN_IPS
derivation" in BASELINE.md). The timed math is the reference's plain
textseg train step (mmseg/models/segmentors/encoder_decoder.py:123-157 +
decode_head.py:227-279 at the textformer recipe,
configs/textformer/textformer_cascade_mit-b0_8x1_160k_textseg.py):

  CascadeMixVisionTransformer B0 forward (512^2 crop)
  -> SegformerHead -> resize to label -> CE + Lovasz (the config's
  loss_decode list) -> backward -> AdamW(6e-5, wd 0.01) step.

The reference modules are loaded through tests/mmcv_shim.py (the same
loader the port-parity tests use); the losses are the VENDORED reference
loss files themselves (mmseg/models/losses/{cross_entropy_loss,
lovasz_loss}.py), so the Lovasz per-pixel sort — a real cost — is timed
with the reference's own code.

Usage: python scripts/measure_ref_seg_cpu.py [batch] [steps] [crop]
Prints one JSON line with sec/step and img/s.
"""

import json
import os
import sys
import time

import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CROP = int(sys.argv[3]) if len(sys.argv) > 3 else 512


def main():
    import mmcv_shim
    ns = mmcv_shim.install()
    ref = mmcv_shim.REF_SEG
    mmcv_shim._load_file("mmseg.models.losses.utils",
                         f"{ref}/mmseg/models/losses/utils.py")
    ce_mod = mmcv_shim._load_file(
        "mmseg.models.losses.cross_entropy_loss",
        f"{ref}/mmseg/models/losses/cross_entropy_loss.py")
    lov_mod = mmcv_shim._load_file(
        "mmseg.models.losses.lovasz_loss",
        f"{ref}/mmseg/models/losses/lovasz_loss.py")

    torch.manual_seed(0)
    # B0 geometry from configs/_base_/models/segformer_mit-b0.py as merged
    # by configs/textformer/textformer_cascade_mit-b0_8x1_160k_textseg.py
    backbone = ns.cascade_mit.CascadeMixVisionTransformer(
        in_channels=3, embed_dims=32, num_stages=4,
        num_layers=[2, 2, 2, 2], num_heads=[1, 2, 5, 8],
        patch_sizes=[7, 3, 3, 3], sr_ratios=[8, 4, 2, 1],
        out_indices=(0, 1, 2, 3), mlp_ratio=4, qkv_bias=True,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.1)
    head = ns.segformer_head.SegformerHead(
        in_channels=[32, 64, 160, 256], in_index=[0, 1, 2, 3],
        channels=256, dropout_ratio=0.1, num_classes=2,
        norm_cfg=dict(type="BN"), align_corners=False,
        loss_decode=dict(type="CrossEntropyLoss"))
    ce = ce_mod.CrossEntropyLoss(use_sigmoid=False, loss_weight=1.0)
    lovasz = lov_mod.LovaszLoss(reduction="none", loss_weight=1.0)
    model = torch.nn.ModuleList([backbone, head]).train()
    opt = torch.optim.AdamW(model.parameters(), lr=6e-5, weight_decay=0.01)

    img = torch.rand(BATCH, 3, CROP, CROP)
    gt = torch.randint(0, 2, (BATCH, CROP, CROP))

    def step():
        opt.zero_grad()
        logits = head(backbone(img))
        logits = F.interpolate(logits, size=(CROP, CROP), mode="bilinear",
                               align_corners=False)
        loss = ce(logits, gt) + lovasz(logits, gt)
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()  # warm
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({
        "metric": "reference_cascade_b0_seg_train_cpu",
        "crop": CROP,
        "sec_per_step": round(dt, 3),
        "batch": BATCH,
        "img_per_sec": round(BATCH / dt, 4),
        "torch": torch.__version__,
        "cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
