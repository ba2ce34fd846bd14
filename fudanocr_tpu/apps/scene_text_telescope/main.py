"""Scene Text Telescope entry point.

CLI mirrors the reference (scene-text-telescope/main.py:8-40):
  python -m fudanocr_tpu.apps.scene_text_telescope.main \
      --arch tbsrn --STN --text_focus [--test] [--demo]
"""

from __future__ import annotations

import logging
import sys

import jax
import jax.numpy as jnp

from fudanocr_tpu.apps import sr_common
from fudanocr_tpu.eval.ctc import CTCLabelConverter


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    args = sr_common.build_argparser(
        "Scene Text Telescope (TBSRN) — TPU-native").parse_args(argv)
    cfg = sr_common.load_app_config(args)

    model = sr_common.build_sr_model(args, cfg)
    train_data = sr_common.build_dataset(cfg.TRAIN.train_data_dir, cfg,
                                         train=True)
    # difficulty buckets (easy/medium/hard) when multiple val dirs are set
    val_dirs = cfg.TRAIN.VAL.val_data_dir
    if len(val_dirs) > 1:
        import os
        val_data = {os.path.basename(d.rstrip("/")):
                    sr_common.build_dataset(d, cfg, train=False)
                    for d in val_dirs}
    else:
        val_data = sr_common.build_dataset(val_dirs[0] if val_dirs else [],
                                           cfg, train=False)

    # loss: plain MSE unless --text_focus, which needs the frozen oracle
    if args.text_focus:
        from fudanocr_tpu.core import checkpoint as ckpt_lib
        from fudanocr_tpu.losses.sr_losses import TextFocusLoss, LOSS_VOCAB
        from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer

        oracle = OCRTransformer(vocab=LOSS_VOCAB, num_in=1,
                                layers=(1, 2, 5, 3), num_heads=16)
        opath = cfg.TRAIN.VAL.get("oracle_checkpoint", "")
        b = 2
        template = oracle.init(jax.random.PRNGKey(0),
                               jnp.zeros((b, cfg.TRAIN.height,
                                          cfg.TRAIN.width, 1)),
                               jnp.zeros((b, 4), jnp.int32))
        if opath:
            oracle_vars = ckpt_lib.load(opath, template)
        else:
            logging.warning("no pretrained text-focus oracle checkpoint "
                            "configured (TRAIN.VAL.oracle_checkpoint); "
                            "using random-init oracle")
            oracle_vars = template
        loss_fn = TextFocusLoss(oracle, oracle_vars, text_focus=True)
    else:
        from fudanocr_tpu.losses.sr_losses import TextFocusLoss
        loss_fn = TextFocusLoss(None, None, text_focus=False)

    # frozen CRNN evaluator
    from fudanocr_tpu.models.rec.crnn import CRNN
    # reference config: CRNN(32, 1, 37, 256) on gray input (base.py:310)
    recognizer = CRNN(num_classes=37)
    rec_variables = recognizer.init(jax.random.PRNGKey(1),
                                    jnp.zeros((2, 32, 100, 1)))
    converter = CTCLabelConverter("0123456789abcdefghijklmnopqrstuvwxyz")

    from fudanocr_tpu.train.sr import SRTrainer
    trainer = SRTrainer(
        model, loss_fn, train_data, val_data,
        batch_size=cfg.TRAIN.batch_size, lr=cfg.TRAIN.lr,
        epochs=cfg.TRAIN.epochs, eval_every=cfg.TRAIN.VAL.valInterval,
        ckpt_dir=cfg.TRAIN.ckpt_dir, recognizer=recognizer,
        rec_variables=rec_variables, converter=converter,
        seed=cfg.TRAIN.manualSeed)

    if args.resume:
        from fudanocr_tpu.core.checkpoint import latest
        path = args.resume if args.resume != "auto" \
            else latest(cfg.TRAIN.ckpt_dir)
        if path:
            trainer.resume(path)

    if args.demo:
        out = trainer.demo(cfg.TRAIN.VAL.vis_dir, n_vis=cfg.TRAIN.VAL.n_vis)
        print(f"wrote demo strips to {out}")
        print(trainer.evaluate(0))
    elif args.test:
        print(trainer.evaluate(0))
    else:
        from fudanocr_tpu.core.logging import guard_run_dir
        if not guard_run_dir(cfg.TRAIN.ckpt_dir, sources=[__file__],
                             resume=bool(args.resume)):
            return
        trainer.train()
        print(trainer.evaluate(-1))


if __name__ == "__main__":
    main()
