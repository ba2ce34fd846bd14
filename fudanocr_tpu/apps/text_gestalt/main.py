"""Text Gestalt entry point (stroke-aware TSRN).

CLI mirrors text-gestalt/main.py: --arch tsrn --text_focus activates the
stroke-focus loss (MSE + stroke_lambda x stroke-attention L1) with a frozen
10-class stroke-decomposition oracle.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from fudanocr_tpu.apps import sr_common
from fudanocr_tpu.eval.ctc import CTCLabelConverter


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    parser = sr_common.build_argparser("Text Gestalt (stroke-aware TSRN)")
    parser.add_argument("--stroke_lambda", type=float, default=50.0)
    parser.add_argument("--decomposition", type=str, default="",
                        help="english_decomposition.txt path")
    args = parser.parse_args(argv)
    cfg = sr_common.load_app_config(args)

    model = sr_common.build_sr_model(args, cfg)
    train_data = sr_common.build_dataset(cfg.TRAIN.train_data_dir, cfg, True)
    val_data = sr_common.build_dataset(
        cfg.TRAIN.VAL.val_data_dir[0] if cfg.TRAIN.VAL.val_data_dir else [],
        cfg, False)

    from fudanocr_tpu.data.codecs import english_stroke_codec
    codec = english_stroke_codec(args.decomposition or None)

    if args.text_focus:
        from fudanocr_tpu.core import checkpoint as ckpt_lib
        from fudanocr_tpu.losses.stroke_focus import StrokeFocusLoss
        from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer

        oracle = OCRTransformer(vocab=codec.num_classes, num_in=1,
                                layers=(1, 2, 5, 3), num_heads=16)
        template = oracle.init(jax.random.PRNGKey(0),
                               jnp.zeros((2, cfg.TRAIN.height,
                                          cfg.TRAIN.width, 1)),
                               jnp.zeros((2, 4), jnp.int32))
        opath = cfg.TRAIN.VAL.get("oracle_checkpoint", "")
        if opath:
            oracle_vars = ckpt_lib.load(opath, template)
        else:
            logging.warning("no pretrained stroke oracle; using random init")
            oracle_vars = template
        loss_fn = StrokeFocusLoss(oracle, oracle_vars,
                                  stroke_lambda=args.stroke_lambda)
    else:
        from fudanocr_tpu.losses.sr_losses import TextFocusLoss
        loss_fn = TextFocusLoss(None, None, text_focus=False)

    from fudanocr_tpu.models.rec.crnn import CRNN
    # reference config: CRNN(32, 1, 37, 256) on gray input
    # (text-gestalt/interfaces/base.py CRNN_init — same as STT base.py:310)
    recognizer = CRNN(num_classes=37)
    rec_variables = recognizer.init(jax.random.PRNGKey(1),
                                    jnp.zeros((2, 32, 100, 1)))
    converter = CTCLabelConverter("0123456789abcdefghijklmnopqrstuvwxyz")

    from fudanocr_tpu.train.sr import SRTrainer

    class StrokeSRTrainer(SRTrainer):
        def _device_batch(self, hr, lr, labels):
            text_input, text_gt, lengths = codec.encode(labels,
                                                        self.max_label_len)
            return {"hr": jnp.asarray(hr), "lr": jnp.asarray(lr),
                    "text_input": jnp.asarray(text_input),
                    "text_gt": jnp.asarray(text_gt),
                    "lengths": jnp.asarray(lengths)}

    trainer = StrokeSRTrainer(
        model, loss_fn, train_data, val_data,
        batch_size=cfg.TRAIN.batch_size, lr=cfg.TRAIN.lr,
        epochs=cfg.TRAIN.epochs, eval_every=cfg.TRAIN.VAL.valInterval,
        ckpt_dir=cfg.TRAIN.ckpt_dir, recognizer=recognizer,
        rec_variables=rec_variables, converter=converter,
        seed=cfg.TRAIN.manualSeed)

    if args.test or args.demo:
        print(trainer.evaluate(0))
    else:
        from fudanocr_tpu.core.logging import guard_run_dir
        if not guard_run_dir(cfg.TRAIN.ckpt_dir, sources=[__file__],
                             resume=bool(getattr(args, "resume", False))):
            return
        trainer.train()
        print(trainer.evaluate(-1))


if __name__ == "__main__":
    main()
