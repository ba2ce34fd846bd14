"""Segmentation test entry (tools/test.py equivalent): evaluation only.

Usage:
  python -m fudanocr_tpu.apps.seg.test configs/seg/textformer_b0_textseg.yaml \
      [--checkpoint ./ckpt/seg_textformer/best] [--tta] [--options ...]
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="scene text segmentation eval")
    p.add_argument("config")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--tta", action="store_true",
                   help="multi-scale + flip test-time augmentation")
    p.add_argument("--options", nargs="*", default=[])
    args = p.parse_args(argv)

    from fudanocr_tpu.core import checkpoint as ckpt_lib
    from fudanocr_tpu.core.config import load_config, merge_cli_overrides
    from fudanocr_tpu.apps.seg.train import build_data, build_model
    from fudanocr_tpu.train.seg import SegTrainer

    cfg = merge_cli_overrides(load_config(args.config), args.options)
    model = build_model(cfg)
    eval_data = build_data(cfg, train=False)

    trainer = SegTrainer(model, eval_data, eval_data,
                         num_classes=cfg.model.decode_head.num_classes,
                         batch_size=cfg.data.batch_size,
                         total_iters=1, eval_every=10**9,
                         ckpt_dir=None)
    if args.checkpoint:
        tree = {"params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats}
        loaded = ckpt_lib.load(args.checkpoint, tree)
        trainer.state = trainer.state.replace(
            params=loaded["params"], batch_stats=loaded["batch_stats"])
    if args.tta:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fudanocr_tpu.eval.seg_metrics import (intersect_and_union,
                                                   total_metrics)
        from fudanocr_tpu.models.seg.encoder_decoder import (slide_inference,
                                                             tta_inference)

        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}

        def fwd(x):
            out = model.apply(variables, x)
            return out[0] if isinstance(out, tuple) else out

        # each TTA variant goes through SLIDE at the configured
        # crop/stride when test.mode == slide — MultiScaleFlipAug wraps
        # the slide test exactly so in the reference (test_cfg mode=
        # 'slide', crop 1024^2 / stride 768^2 in every textformer config)
        if cfg.test.mode == "slide":
            crop = tuple(cfg.test.crop)
            stride = tuple(cfg.test.stride)
            scale_fwd = lambda x: slide_inference(fwd, x, crop, stride)
        else:
            scale_fwd = fwd

        infer = jax.jit(lambda img: tta_inference(scale_fwd, img,
                                                  scales=(0.75, 1.0, 1.25)))
        hist = np.zeros((4, cfg.model.decode_head.num_classes), np.float64)
        for batch in eval_data.batches(cfg.data.batch_size):
            probs = infer(jnp.asarray(batch["img"]))
            pred = jnp.argmax(probs, -1)
            gt = jnp.asarray(batch["gt_seg"])
            if "valid" in batch:
                gt = jnp.where(
                    jnp.asarray(batch["valid"])[:, None, None] > 0, gt, 255)
            stats = intersect_and_union(pred, gt,
                                        cfg.model.decode_head.num_classes)
            hist += np.stack([np.asarray(s) for s in stats])
        res = total_metrics(*hist)
        res = {k: res[k] for k in ("aAcc", "mIoU", "mDice", "mFscore")}
        print(res)
        return res
    else:
        res = trainer.evaluate(0)
        print(res)
        return res


if __name__ == "__main__":
    main()
