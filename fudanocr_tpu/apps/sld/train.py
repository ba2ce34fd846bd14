"""Stroke-level decomposition (IJCAI-21) entry point.

Mirrors stroke-level-decomposition/train.py + config.py: a config dict with
mode 'character'/'stroke', Adadelta lr 1.0, batch 32, 32x32 inputs; stroke
mode decodes 5-class stroke strings ('<12345$' alphabet), Levenshtein-
rectifies them to the nearest legal decomposition, and (when a confusable
gallery is configured) disambiguates identical decompositions by conv-
feature matching against printed-font galleries (util.py:188-275).

Usage: python -m fudanocr_tpu.apps.sld.train [--options k=v ...]
"""

from __future__ import annotations

import argparse
import logging

from fudanocr_tpu.core.config import Config, merge_cli_overrides

DEFAULT_CONFIG = Config({
    "exp_name": "sld",
    "epoch": 1,
    "lr": 1.0,
    "mode": "stroke",           # character / stroke
    "batch": 32,
    "val_frequency": 1000,
    "test_only": False,
    "resume": "",
    "train_dataset": "",        # comma-separated LMDB roots; empty=synthetic
    "test_dataset": "",
    "weight_decay": False,
    "image_size": 32,
    "alphabet": 3755,
    "decompose_table": "",      # decompose-stroke-3755.txt path
    "ckpt_dir": "./ckpt/sld",
    "max_len": 30,
    "synthetic_samples": 64,
    # reference model scale (transformer.py:77: ResNet [3,4,6,3]); smoke
    # tests override to a tiny encoder to keep CI fast
    "encoder_layers": [3, 4, 6, 3],
    "d_embed": 512,
    "d_model": 1024,
    "d_ff": 2048,
    "encoder_width_div": 1,  # smoke-test channel shrink (see OCRResNet)
})

STROKE_ALPHABET = "<12345$"


def build_codec_and_data(cfg):
    from fudanocr_tpu.data.codecs import SequenceCodec, load_decomposition_table
    from fudanocr_tpu.data.rec_dataset import RecLMDBDataset, SyntheticCharDataset
    from fudanocr_tpu.eval.levenshtein import SequenceRectifier

    if cfg.decompose_table:
        table = load_decomposition_table(cfg.decompose_table, "sld")
    else:
        logging.warning("no decompose_table configured; generating a "
                        "synthetic stroke table (tests/demo only)")
        import random, string
        rng = random.Random(0)
        chars = string.ascii_uppercase + string.digits
        table = {ch: "".join(rng.choice("12345")
                             for _ in range(rng.randint(2, 6)))
                 for ch in chars}

    if cfg.mode not in ("stroke", "character"):
        raise ValueError(f"mode must be 'stroke' or 'character', "
                         f"got {cfg.mode!r}")
    if cfg.mode == "stroke":
        codec = SequenceCodec(STROKE_ALPHABET, table, terminator="$")
        rectifier = SequenceRectifier(sorted(set(table.values())))
    else:
        charset = sorted(table.keys())
        codec = SequenceCodec(["<"] + charset + ["$"], None, terminator="$")
        rectifier = None

    size = (cfg.image_size, cfg.image_size)
    if cfg.train_dataset:
        train = RecLMDBDataset(cfg.train_dataset.split(","), size)
        test = RecLMDBDataset(cfg.test_dataset.split(","), size)
    else:
        charset = "".join(sorted(table.keys()))
        train = SyntheticCharDataset(charset, cfg.synthetic_samples, size)
        test = SyntheticCharDataset(charset, max(cfg.synthetic_samples // 4,
                                                 8), size, seed=1)
    return codec, rectifier, train, test


def attach_confusable_matching(trainer, codec, cfg):
    """Disambiguate characters that share one stroke decomposition by
    conv-feature matching against printed-font galleries
    (sld/util.py:188-275). The reference loads simsun/simfang pickles; here
    the gallery images come from `support_gallery` LMDB dirs when
    configured, else PIL-rendered templates. Wraps the trainer's
    `evaluate` to score per-CHARACTER accuracy instead of per-sequence."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    table = codec.decomposition
    seq_to_chars = {}
    for ch, seq in table.items():
        seq_to_chars.setdefault(seq, []).append(ch)

    from fudanocr_tpu.apps.oictr.train import render_char_templates

    charset = sorted(table.keys())
    templates = render_char_templates(charset, cfg.image_size)

    def evaluate(it: int = 0):
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        encode = jax.jit(lambda v, im: trainer.model.apply(
            v, im, method=trainer.model.encode))
        gallery = {}
        for s in range(0, len(charset), 64):
            mem = np.asarray(encode(
                variables,
                jnp.asarray(np.stack([templates[c]
                                      for c in charset[s:s + 64]]))))
            for j in range(mem.shape[0]):
                gallery[charset[s + j]] = mem[j]

        total, correct = 0, 0
        for images, labels in trainer.eval_data.batches(trainer.batch_size):
            preds = trainer.decode_batch(images)
            probe = np.asarray(encode(variables, jnp.asarray(images)))
            for i, (p, gt_char) in enumerate(zip(preds, labels)):
                total += 1
                gt_seq = table.get(gt_char, "")
                if p != gt_seq:
                    continue
                cands = seq_to_chars.get(p, [])
                if len(cands) <= 1:
                    correct += int(bool(cands) and cands[0] == gt_char)
                    continue
                scores = [float(np.mean((probe[i] - gallery[c]) ** 2))
                          for c in cands]
                correct += int(cands[int(np.argmin(scores))] == gt_char)
        acc = correct / max(total, 1)
        logging.getLogger("fudanocr_tpu.sld").info(
            "confusable-matched eval @%d: acc %.4f (%d/%d)", it, acc,
            correct, total)
        return {"acc": acc}

    trainer.evaluate = evaluate


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description="stroke-level decomposition CTR")
    p.add_argument("--options", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = merge_cli_overrides(DEFAULT_CONFIG, args.options)

    from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer
    from fudanocr_tpu.train.ctr import CTRTrainer

    codec, rectifier, train_data, test_data = build_codec_and_data(cfg)
    model = OCRTransformer(vocab=codec.num_classes, num_in=3,
                           layers=tuple(cfg.encoder_layers), num_heads=4,
                           d_embed=cfg.d_embed, d_model=cfg.d_model,
                           d_ff=cfg.d_ff, stage1_pool=False,
                           encoder_width_div=cfg.encoder_width_div)

    trainer = CTRTrainer(model, codec, train_data, test_data,
                         batch_size=cfg.batch, lr=cfg.lr,
                         weight_decay=1e-4 if cfg.weight_decay else 0.0,
                         epochs=cfg.epoch, eval_every=cfg.val_frequency,
                         max_len=cfg.max_len, rectifier=rectifier,
                         ckpt_dir=cfg.ckpt_dir,
                         image_size=(cfg.image_size, cfg.image_size))

    if cfg.mode == "stroke":
        attach_confusable_matching(trainer, codec, cfg)

    if cfg.test_only:
        print(trainer.evaluate(0))
    else:
        # the reference's saver()+overwrite prompt (sld/util.py:144-173)
        from fudanocr_tpu.core.logging import guard_run_dir
        if not guard_run_dir(cfg.ckpt_dir, sources=[__file__]):
            return
        trainer.train()
        print(trainer.evaluate(-1))


if __name__ == "__main__":
    main()
