"""CCR-CLIP stage 2: CTR training against the frozen radical gallery.

Mirrors image-ids-CTR/train.py: the shared OCRTransformer emits 2048-d
embeddings per decoding step (generator out_dim=2048); the gallery is
[zeros, encode_text(char IDS)..., ones] from the frozen stage-1 model;
loss = CE(normalised pred @ gallery^T, gt) - 0.001 * MSE(pred, gallery[gt])
(a repulsion regulariser, train.py:74-80); Adadelta lr 1.0 wd 1e-4 with
cosine warm restarts (T_0=10).
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

from fudanocr_tpu.core.config import Config, merge_cli_overrides
from fudanocr_tpu.core import checkpoint as ckpt_lib

log = logging.getLogger("fudanocr_tpu.ccr_clip2")

DEFAULT_CONFIG = Config({
    "epoch": 1,
    "train_dataset": "",
    "test_dataset": "",
    "batch": 32,
    "image_size": 32,
    "alpha_path": "",            # charset file (one char stream)
    "alphabet_path": "",         # radical alphabet (stage 1)
    "decompose_path": "",        # radical decomposition (stage 1)
    "radical_model": "",         # stage-1 checkpoint dir
    "lr": 1.0,
    "max_len": 48,
    "val_frequency": 1000,
    "ckpt_dir": "./ckpt/ccr_clip_ctr",
    "synthetic_samples": 64,
    "test_only": False,
})


def build_gallery(cfg, charset, codec):
    """Frozen text features [zeros, chars..., ones] (train.py:40-61)."""
    from fudanocr_tpu.models.rec.ccr_clip import CCRCLIP

    clip = CCRCLIP(vocab_size=codec.num_classes, context_length=30)
    template = clip.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, 128, 128, 3)),
                         jnp.zeros((2, 30), jnp.int32))
    if cfg.radical_model:
        variables = ckpt_lib.load(cfg.radical_model, template)
    else:
        log.warning("no stage-1 checkpoint (radical_model); using random "
                    "CLIP text tower for the gallery")
        variables = template

    encode = jax.jit(lambda v, t: clip.apply(v, t,
                                             method=clip.encode_text))
    feats = [np.zeros((1, 2048), np.float32)]
    for s in range(0, len(charset), 100):
        _, gt, _ = codec.encode(charset[s:s + 100], 30)
        feats.append(np.asarray(encode(variables, jnp.asarray(gt)),
                                np.float32))
    feats.append(np.ones((1, 2048), np.float32))
    return jnp.asarray(np.concatenate(feats, 0))


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="CCR-CLIP stage-2 CTR")
    p.add_argument("--options", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = merge_cli_overrides(DEFAULT_CONFIG, args.options)

    from fudanocr_tpu.data.codecs import SequenceCodec, radical_codec
    from fudanocr_tpu.data.rec_dataset import (RecLMDBDataset,
                                               SyntheticCharDataset)
    from fudanocr_tpu.models.rec.ocr_transformer import (
        OCRTransformer, greedy_decode_gallery)
    from fudanocr_tpu.train.ctr import CTRTrainer

    rcodec = radical_codec(cfg.alphabet_path or None,
                           cfg.decompose_path or None)
    if cfg.alpha_path:
        charset = list(open(cfg.alpha_path, encoding="utf-8").read())
    else:
        charset = sorted(rcodec.decomposition.keys())

    # character-level codec over the gallery alphabet: '<' + chars + '$'
    codec = SequenceCodec(["<"] + charset + ["$"], None, terminator="$")
    gallery = build_gallery(cfg, charset, rcodec)

    size = (cfg.image_size, cfg.image_size)
    if cfg.train_dataset:
        train_data = RecLMDBDataset(cfg.train_dataset.split(","), size)
        test_data = RecLMDBDataset(cfg.test_dataset.split(","), size)
    else:
        cs = "".join(charset)
        train_data = SyntheticCharDataset(cs, cfg.synthetic_samples, size)
        test_data = SyntheticCharDataset(cs, max(cfg.synthetic_samples // 4,
                                                 8), size, seed=1)

    # image-ids-CTR uses the wide 3-stage encoder with pools before every
    # stage (image-ids-CTR/model/transformer.py:80-152)
    model = OCRTransformer(vocab=codec.num_classes, out_dim=2048,
                           num_in=3, num_heads=4,
                           encoder_preset="image_ids")

    def gallery_loss(out, batch):
        pred = out["pred"].astype(jnp.float32)  # (B, L, 2048)
        pred = pred / jnp.maximum(
            jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-8)
        logits = jnp.einsum("bld,vd->blv", pred, gallery)
        l = batch["text_gt"].shape[1]
        mask = (jnp.arange(l)[None] < batch["lengths"][:, None]
                ).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, batch["text_gt"][..., None],
                                   axis=-1)[..., 0]
        loss_rec = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        reg = gallery[batch["text_gt"]]  # (B, L, 2048)
        mse = jnp.sum(((pred - reg) ** 2) * mask[..., None]) / jnp.maximum(
            jnp.sum(mask) * reg.shape[-1], 1.0)
        return loss_rec - 0.001 * mse

    trainer = CTRTrainer(model, codec, train_data, test_data,
                         batch_size=cfg.batch, lr=cfg.lr, weight_decay=1e-4,
                         epochs=cfg.epoch, eval_every=cfg.val_frequency,
                         max_len=cfg.max_len, ckpt_dir=cfg.ckpt_dir,
                         image_size=size, loss_fn=gallery_loss)

    # gallery-based decode overrides the logits argmax
    def decode_batch(images):
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        ids = np.asarray(greedy_decode_gallery(
            model, variables, jnp.asarray(images), gallery, cfg.max_len))
        out = []
        for row in ids:
            toks = []
            for t in row:
                tok = codec.alphabet[int(t)]
                if tok == "$":
                    break
                toks.append(tok)
            out.append("".join(toks))
        return out

    trainer.decode_batch = decode_batch

    if cfg.test_only:
        print(trainer.evaluate(0))
    else:
        trainer.train()
        print(trainer.evaluate(-1))


if __name__ == "__main__":
    main()
