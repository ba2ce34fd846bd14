"""CCR-CLIP stage 1: contrastive image-IDS pretraining.

Mirrors image-ids-CTR/CCR-CLIP/main.py: batches of (char image, char) from
font-rendered datasets; radical-token text tower; symmetric CE with
first-occurrence targets; zero-shot retrieval eval against the whole
charset's text features (encoded in chunks); Adam 1e-4 (0.9, 0.98) with
lr x0.8 every 2 epochs after epoch 10.
"""

from __future__ import annotations

import argparse
import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fudanocr_tpu.core.config import Config, merge_cli_overrides
from fudanocr_tpu.core import checkpoint as ckpt_lib
from fudanocr_tpu.core.mesh import make_mesh
from fudanocr_tpu.data.codecs import radical_codec
from fudanocr_tpu.losses.clip_loss import (clip_symmetric_ce,
                                           first_occurrence_targets)
from fudanocr_tpu.models.rec.ccr_clip import CCRCLIP
from fudanocr_tpu.train.state import TrainState

log = logging.getLogger("fudanocr_tpu.ccr_clip")

DEFAULT_CONFIG = Config({
    "epoch": 1,
    "train_dataset": "",
    "test_dataset": "",
    "batch": 32,
    "imageW": 128,
    "imageH": 128,
    "alphabet_path": "",
    "decompose_path": "",
    "max_len": 30,
    "lr": 1e-4,
    "ckpt_dir": "./ckpt/ccr_clip",
    "val_frequency": 1000,
    "synthetic_samples": 64,
    "test_only": False,
    "transformer_layers": 12,
})


class CLIPPretrainer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.codec = radical_codec(cfg.alphabet_path or None,
                                   cfg.decompose_path or None)
        self.charset = sorted(self.codec.decomposition.keys())

        from fudanocr_tpu.data.rec_dataset import (RecLMDBDataset,
                                                   SyntheticCharDataset)
        size = (cfg.imageH, cfg.imageW)
        if cfg.train_dataset:
            self.train_data = RecLMDBDataset(cfg.train_dataset.split(","),
                                             size)
            self.test_data = RecLMDBDataset(cfg.test_dataset.split(","), size)
        else:
            cs = "".join(self.charset)
            self.train_data = SyntheticCharDataset(cs, cfg.synthetic_samples,
                                                   size)
            self.test_data = SyntheticCharDataset(
                cs, max(cfg.synthetic_samples // 4, 8), size, seed=1)

        self.model = CCRCLIP(vocab_size=self.codec.num_classes,
                             context_length=cfg.max_len,
                             transformer_layers=cfg.transformer_layers)
        self.mesh = make_mesh()
        variables = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, *size, 3)),
            jnp.zeros((2, cfg.max_len), jnp.int32), train=True)

        self.lr = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate, b1=0.9, b2=0.98,
                                             eps=1e-6))(learning_rate=cfg.lr)
        self.state = TrainState.create(variables["params"],
                                       variables.get("batch_stats", {}),
                                       self.lr)
        self.train_step = self._make_train_step()
        self.best_acc = -1.0

    def _make_train_step(self):
        model = self.model

        def step(state, images, text, targets):
            def loss_of(params):
                (img_f, txt_f, scale), mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, text, train=True, mutable=["batch_stats"])
                return clip_symmetric_ce(img_f, txt_f, scale, targets), \
                    mutated["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            return state.apply_gradients(grads, new_batch_stats=new_bs), loss

        return jax.jit(step, donate_argnums=(0,))

    def _encode_text_tokens(self, labels):
        # CLIP text input is the raw radical sequence incl. terminator
        # (utils.py:55-68), i.e. the dense target grid, not shift-right
        _, gt, _ = self.codec.encode(labels, self.cfg.max_len)
        return gt

    def charset_text_features(self, chunk: int = 100) -> jax.Array:
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        feats = []
        encode = jax.jit(lambda v, t: self.model.apply(
            v, t, method=self.model.encode_text))
        for s in range(0, len(self.charset), chunk):
            labels = self.charset[s:s + chunk]
            tokens = jnp.asarray(self._encode_text_tokens(labels))
            feats.append(np.asarray(encode(variables, tokens)))
        return jnp.asarray(np.concatenate(feats, 0))

    def train(self):
        cfg = self.cfg
        it = 0
        for epoch in range(cfg.epoch):
            for images, labels in self.train_data.batches(cfg.batch):
                text = jnp.asarray(self._encode_text_tokens(labels))
                targets = jnp.asarray(first_occurrence_targets(labels))
                self.state, loss = self.train_step(
                    self.state, jnp.asarray(images), text, targets)
                it += 1
                if it % 50 == 0:
                    log.info("epoch %d iter %d loss %.4f", epoch, it,
                             float(loss))
            # lr schedule: x0.8 every 2 epochs after 10 (main.py:113-116)
            if (epoch + 1) > 10 and (epoch + 1) % 2 == 0:
                self.state.opt_state.hyperparams["learning_rate"] = \
                    self.state.opt_state.hyperparams["learning_rate"] * 0.8
            self.evaluate(epoch)
        return self.state

    def evaluate(self, epoch: int = 0) -> Dict[str, float]:
        text_features = self.charset_text_features()
        tf = text_features / jnp.linalg.norm(text_features, axis=1,
                                             keepdims=True)
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        enc_img = jax.jit(lambda v, im: self.model.apply(
            v, im, method=self.model.encode_image))
        correct, total = 0, 0
        for images, labels in self.test_data.batches(self.cfg.batch):
            img_f = enc_img(variables, jnp.asarray(images))
            img_f = img_f / jnp.linalg.norm(img_f, axis=1, keepdims=True)
            idx = np.asarray(jnp.argmax(img_f @ tf.T, axis=1))
            for i, lab in enumerate(labels):
                correct += int(self.charset[idx[i]] == lab)
                total += 1
        acc = correct / max(total, 1)
        log.info("zero-shot retrieval acc @epoch %d: %.4f (%d/%d)", epoch,
                 acc, correct, total)
        if self.cfg.ckpt_dir and acc >= self.best_acc:
            self.best_acc = acc
            ckpt_lib.save(f"{self.cfg.ckpt_dir}/best",
                          {"params": self.state.params,
                           "batch_stats": self.state.batch_stats},
                          meta={"epoch": epoch, "acc": acc})
        return {"acc": acc}


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="CCR-CLIP pretraining")
    p.add_argument("--options", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = merge_cli_overrides(DEFAULT_CONFIG, args.options)
    trainer = CLIPPretrainer(cfg)
    if cfg.test_only:
        print(trainer.evaluate(0))
    else:
        trainer.train()


if __name__ == "__main__":
    main()
