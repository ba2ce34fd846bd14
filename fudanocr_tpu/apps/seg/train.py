"""Scene text segmentation trainer (text-focused Transformers).

Mirrors text-focused-Transformers/tools/train.py: config with `_base_`
inheritance, CascadeMiT + SegFormer head, AdamW paramwise / poly LR,
periodic mIoU/mFscore eval.

Usage:
  python -m fudanocr_tpu.apps.seg.train configs/seg/textformer_b0_textseg.yaml \
      [--options k.subk=v ...]
"""

from __future__ import annotations

import argparse
import logging

from fudanocr_tpu.core.config import load_config, merge_cli_overrides

log = logging.getLogger("fudanocr_tpu.seg_app")

def build_data(cfg, train: bool):
    from fudanocr_tpu.data import seg_pipeline as pp
    from fudanocr_tpu.data.seg_dataset import SegDataset, SyntheticTextSeg

    d = cfg.data
    crop = tuple(d.crop_size)
    train_pipeline = [
        pp.LoadImageFromFile(),
        # keep_ratio aspect-preserving rescale + reference train padding
        # (seg_pad_val=0: padded pixels are BACKGROUND in the loss, as in
        # configs/_base_/datasets/BTS.py:10,15); both config-overridable
        pp.Resize((crop[1] * 2, crop[0] * 2), (0.5, 2.0),
                  keep_ratio=d.get("keep_ratio", True)),
        pp.RandomCrop(crop),
        pp.RandomFlip(0.5),
        pp.PhotoMetricDistortion(),
        pp.Normalize(),
        pp.Pad(crop, seg_pad_val=d.get("seg_pad_val", 0)),
    ]
    # eval pads stay IGNORED (255): the reference evaluates at original
    # resolution without padding, so padded pixels must not count
    test_pipeline = [pp.LoadImageFromFile(), pp.Normalize(),
                     pp.Pad(crop, seg_pad_val=255)]
    pipeline = train_pipeline if train else test_pipeline

    if d.dataset == "synthetic" or not d.img_dir:
        size = tuple(d.synthetic_size)
        n = d.synthetic_samples
        pipe = [pp.Normalize()]  # keep synthetic geometry fixed
        return SyntheticTextSeg(n if train else max(n // 4, 4), size, pipe,
                                seed=0 if train else 1,
                                with_det=bool(d.get("det_dir", "")
                                              or cfg.model.get("det_guided")))
    pipeline.insert(1, pp.LoadAnnotations(pp.REMAPS[d.dataset]))
    img_dir = d.img_dir if train else (d.val_img_dir or d.img_dir)
    ann_dir = d.ann_dir if train else (d.val_ann_dir or d.ann_dir)
    # det masks exist only for the train split in the reference layout
    # (textseg.py det_prefix is train-only) and gt_det is never consumed at
    # eval — passing the train det_dir here used to crash eval of *_det
    # configs with FileNotFoundError on val basenames.
    det_dir = (d.get("det_dir") or None) if train else None
    return SegDataset(img_dir, ann_dir, pipeline, det_dir=det_dir)


def build_model(cfg):
    """Registry-driven (the reference's SEGMENTORS/BACKBONES/HEADS
    registries, mmseg/models/builder.py): types are selectable via
    model.{type,backbone.type,decode_head.type} with det-guided defaults
    when model.det_guided is set."""
    import fudanocr_tpu.models.seg  # noqa: F401  (registers components)
    from fudanocr_tpu.core.registry import BACKBONES, HEADS, SEGMENTORS

    det = cfg.model.get("det_guided", False)
    b = cfg.model.backbone
    h = cfg.model.decode_head
    backbone = BACKBONES.get(
        b.get("type", "CascadeMiTDetGuided" if det else "CascadeMiT"))(
        embed_dims=b.embed_dims, num_layers=tuple(b.num_layers),
        num_heads=tuple(b.num_heads), sr_ratios=tuple(b.sr_ratios),
        drop_path_rate=b.drop_path_rate)
    head = HEADS.get(h.get("type", "SegformerHead"))(
        num_classes=h.num_classes, channels=h.channels,
        dropout_ratio=h.dropout_ratio)
    segmentor = SEGMENTORS.get(
        cfg.model.get("type",
                      "DetGuidedEncoderDecoder" if det else "EncoderDecoder"))
    return segmentor(backbone=backbone, decode_head=head)


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description="scene text segmentation")
    p.add_argument("config")
    p.add_argument("--test-only", action="store_true")
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from the latest periodic checkpoint in "
                        "ckpt_dir (tools/train.py --auto-resume)")
    p.add_argument("--options", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = merge_cli_overrides(load_config(args.config), args.options)

    # env report + host-threading knobs at startup (tools/train.py does
    # collect_env + setup_multi_processes before building anything)
    from fudanocr_tpu.core.runtime_env import setup_multi_processes
    from fudanocr_tpu.utils.collect_env import collect_env

    setup_multi_processes(cfg)
    for k, v in collect_env().items():
        log.info("%s: %s", k, v)

    from fudanocr_tpu.train.seg import SegTrainer

    model = build_model(cfg)
    train_data = build_data(cfg, True)
    eval_data = build_data(cfg, False)

    use_slide = (cfg.test.mode == "slide"
                 and cfg.data.dataset != "synthetic" and cfg.data.img_dir)
    trainer = SegTrainer(
        model, train_data, eval_data,
        num_classes=cfg.model.decode_head.num_classes,
        batch_size=cfg.data.batch_size, lr=cfg.optimizer.lr,
        total_iters=cfg.schedule.total_iters,
        eval_every=cfg.schedule.eval_every,
        loss_weights=cfg.loss.to_dict(),
        crop=tuple(cfg.test.crop) if use_slide else None,
        stride=tuple(cfg.test.stride) if use_slide else None,
        ckpt_dir=cfg.ckpt_dir,
        # train_cfg=dict(det_loss_ratio=0.1) in the reference det configs
        det_loss_ratio=cfg.get("train_cfg", {}).get("det_loss_ratio", 0.1),
        gt_guided_masks=cfg.get("train_cfg", {}).get("gt_guided_masks",
                                                     False),
        auto_resume=args.auto_resume)

    if args.test_only:
        print(trainer.evaluate(0))
    else:
        trainer.train()
        print(trainer.evaluate(-1))


if __name__ == "__main__":
    main()
