"""Orientation-independent CTR entry point.

Mirrors orientation-independent-CTR/train.py + data/lmdbReader.py:80-133:

* collate applies the aspect-ratio rule (1.5*w >= h -> horizontal,
  else vertical; vertical images are rotated into the horizontal frame)
  and produces (images, is_v) pairs;
* loss = CE(decode) + 5 * (MSE(raw recon, char template) +
  MSE(dir-swapped recon, rotated template)) + CE(direction);
* the char templates (reference: SIMSUN renders + their rot90,
  util.py:90-109) come from a configured template dir or are rendered
  with PIL;
* Adadelta lr 1.0 wd 1e-4 + cosine warm restarts (T_0=10).
"""

from __future__ import annotations

import argparse
import logging
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image, ImageDraw

from fudanocr_tpu.core.config import Config, merge_cli_overrides
from fudanocr_tpu.core import checkpoint as ckpt_lib
from fudanocr_tpu.core.mesh import make_mesh
from fudanocr_tpu.train.ctr import masked_token_ce
from fudanocr_tpu.train.state import TrainState

log = logging.getLogger("fudanocr_tpu.oictr")

DEFAULT_CONFIG = Config({
    "epoch": 1, "lr": 1.0, "batch": 32, "val_frequency": 1000,
    "imageH": 32, "imageW": 128, "max_len": 16,
    "train_dataset": "", "test_dataset": "", "alphabet_path": "",
    "ckpt_dir": "./ckpt/oictr", "synthetic_samples": 64,
    "test_only": False,
    # "" = reference depth [3,4,6]; smokes pass e.g. "1,1,1"
    "encoder_layers": "",
    # smoke-test shrink knobs (reference: d_model 512, d_embed 256, div 1)
    "d_model": 512, "d_embed": 256, "encoder_width_div": 1,
})


def render_char_templates(charset, size: int = 32) -> Dict[str, np.ndarray]:
    """PIL stand-ins for the SIMSUN char templates ([-1,1] RGB 32x32)."""
    out = {}
    for ch in charset:
        img = Image.new("RGB", (size, size), (255,) * 3)
        ImageDraw.Draw(img).text((size // 3, size // 3), ch, fill=(0,) * 3)
        out[ch] = np.asarray(img, np.float32) / 127.5 - 1.0
    return out


def swap_indices(is_v_char: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """For each valid char, index of a valid char of the OPPOSITE
    orientation (cyclic, transformer.py:466-483); self-index if none."""
    n = len(is_v_char)
    hor = [i for i in range(n) if valid[i] and is_v_char[i] == 0]
    ver = [i for i in range(n) if valid[i] and is_v_char[i] == 1]
    out = np.arange(n, dtype=np.int32)
    if hor and ver:
        for j, i in enumerate(hor):
            out[i] = ver[j % len(ver)]
        for j, i in enumerate(ver):
            out[i] = hor[j % len(hor)]
    return out


class OICTRTrainer:
    def __init__(self, cfg):
        from fudanocr_tpu.data.codecs import SequenceCodec
        from fudanocr_tpu.data.rec_dataset import (RecLMDBDataset,
                                                   SyntheticCharDataset)
        from fudanocr_tpu.models.rec.oictr import OICTR

        self.cfg = cfg
        if cfg.alphabet_path:
            charset = [ln.rstrip("\n") for ln in
                       open(cfg.alphabet_path, encoding="utf-8") if ln.strip()]
        else:
            import string
            charset = list(string.ascii_uppercase + string.digits)
        self.charset = charset
        self.codec = SequenceCodec(["<"] + charset + ["$"], None,
                                   terminator="$")
        self.templates = render_char_templates(charset)

        from fudanocr_tpu.data.rec_dataset import OrientationLMDBDataset

        size = (cfg.imageH, cfg.imageW)
        if cfg.train_dataset:
            self.train_data = OrientationLMDBDataset(
                cfg.train_dataset.split(","), size)
            self.test_data = OrientationLMDBDataset(
                cfg.test_dataset.split(","), size)
        else:
            cs = "".join(charset)
            self.train_data = SyntheticCharDataset(cs, cfg.synthetic_samples,
                                                   size)
            self.test_data = SyntheticCharDataset(
                cs, max(cfg.synthetic_samples // 4, 8), size, seed=1)

        enc_layers = (tuple(int(x) for x in str(cfg.encoder_layers).split(","))
                      if cfg.encoder_layers else None)
        self.model = OICTR(vocab=self.codec.num_classes,
                           d_model=cfg.d_model, d_embed=cfg.d_embed,
                           encoder_layers=enc_layers,
                           encoder_width_div=cfg.encoder_width_div)
        self.mesh = make_mesh()
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), jnp.zeros((2, *size, 3)),
            jnp.zeros((2, cfg.max_len), jnp.int32), train=True)
        # Adadelta + CosineAnnealingWarmRestarts(T_0=10 epochs)
        # (orientation-independent-CTR/train.py:29-30)
        from fudanocr_tpu.train.schedules import cosine_warm_restarts
        steps_per_epoch = max(len(self.train_data) // cfg.batch, 1)
        tx = optax.chain(optax.add_decayed_weights(1e-4),
                         optax.adadelta(
                             learning_rate=cosine_warm_restarts(
                                 cfg.lr, 10 * steps_per_epoch),
                             rho=0.9, eps=1e-6))
        self.state = TrainState.create(variables["params"],
                                       variables.get("batch_stats", {}), tx)
        self.train_step = self._make_train_step()
        self.best_acc = -1.0

    def _make_train_step(self):
        model = self.model

        def step(state, batch, rng):
            def loss_of(params):
                out, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["image"], batch["text_input"], train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                loss_rec = masked_token_ce(out["pred"], batch["text_gt"],
                                           batch["lengths"])
                dir_logp = jax.nn.log_softmax(
                    out["direction_logits"].astype(jnp.float32), -1)
                loss_dir = -jnp.mean(jnp.take_along_axis(
                    dir_logp, batch["is_v"][:, None], axis=-1))

                b, l = batch["text_gt"].shape
                cm = out["char_maps"].reshape(b * l, model.d_model, 4)
                df = jnp.repeat(out["direction_feat"], l, axis=0)
                raw = out["raw_imgs"]
                swapped_df = df[batch["swap_idx"]]
                new = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    cm, swapped_df, method=model.reconstruct)

                m = batch["char_valid"].astype(jnp.float32)[:, None, None,
                                                            None]
                denom = jnp.maximum(jnp.sum(m) * 32 * 32 * 3, 1.0)
                loss_raw = jnp.sum(((raw - batch["raw_gt"]) ** 2) * m) / denom
                loss_new = jnp.sum(((new - batch["new_gt"]) ** 2) * m) / denom

                return loss_rec + 5.0 * (loss_raw + loss_new) + loss_dir, \
                    mutated["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            return state.apply_gradients(grads, new_batch_stats=new_bs), loss

        return jax.jit(step, donate_argnums=(0,))

    def _device_batch(self, images, labels, is_v=None):
        cfg = self.cfg
        text_input, text_gt, lengths = self.codec.encode(labels, cfg.max_len)
        b, l = text_gt.shape
        # orientation comes from the dataset's aspect-ratio rule when
        # available (OrientationLMDBDataset); synthetic chars are horizontal
        is_v = (np.zeros((b,), np.int32) if is_v is None
                else np.asarray(is_v, np.int32))
        char_valid = np.zeros((b, l), np.float32)
        raw_gt = np.zeros((b * l, 32, 32, 3), np.float32)
        new_gt = np.zeros((b * l, 32, 32, 3), np.float32)
        is_v_char = np.zeros((b * l,), np.int32)
        for i, lab in enumerate(labels):
            for j, ch in enumerate(lab[:l]):
                if j >= lengths[i] - 1 or ch not in self.templates:
                    continue
                char_valid[i, j] = 1.0
                t = self.templates[ch]
                rot = np.rot90(t, 1, (0, 1)).copy()
                if is_v[i] == 0:
                    raw_gt[i * l + j] = t
                    new_gt[i * l + j] = rot
                else:
                    raw_gt[i * l + j] = rot
                    new_gt[i * l + j] = t
                is_v_char[i * l + j] = is_v[i]
        swap = swap_indices(is_v_char, char_valid.reshape(-1))
        return {"image": jnp.asarray(images),
                "text_input": jnp.asarray(text_input),
                "text_gt": jnp.asarray(text_gt),
                "lengths": jnp.asarray(lengths),
                "is_v": jnp.asarray(is_v),
                "char_valid": jnp.asarray(char_valid.reshape(-1)),
                "raw_gt": jnp.asarray(raw_gt),
                "new_gt": jnp.asarray(new_gt),
                "swap_idx": jnp.asarray(swap)}

    def train(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(0)
        it = 0
        for epoch in range(cfg.epoch):
            for batch in self.train_data.batches(cfg.batch):
                rng, srng = jax.random.split(rng)
                self.state, loss = self.train_step(
                    self.state, self._device_batch(*batch), srng)
                it += 1
                if it % 50 == 0:
                    log.info("epoch %d iter %d loss %.4f", epoch, it,
                             float(loss))
                if it % cfg.val_frequency == 0:
                    self.evaluate(it)
        return self.state

    def evaluate(self, it: int = 0):
        from fudanocr_tpu.models.rec.ocr_transformer import greedy_decode

        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        correct, total = 0, 0
        for batch in self.test_data.batches(self.cfg.batch):
            images, labels = batch[0], batch[1]
            ids = np.asarray(greedy_decode(self.model, variables,
                                           jnp.asarray(images),
                                           self.cfg.max_len))
            for row, lab in zip(ids, labels):
                toks = []
                for t in row:
                    tok = self.codec.alphabet[int(t)]
                    if tok == "$":
                        break
                    toks.append(tok)
                correct += int("".join(toks) == lab)
                total += 1
        acc = correct / max(total, 1)
        log.info("eval @%d: acc %.4f (%d/%d)", it, acc, correct, total)
        if self.cfg.ckpt_dir and acc >= self.best_acc:
            self.best_acc = acc
            ckpt_lib.save(f"{self.cfg.ckpt_dir}/best",
                          {"params": self.state.params,
                           "batch_stats": self.state.batch_stats},
                          meta={"step": int(self.state.step), "acc": acc})
        return {"acc": acc}


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="orientation-independent CTR")
    p.add_argument("--options", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = merge_cli_overrides(DEFAULT_CONFIG, args.options)
    trainer = OICTRTrainer(cfg)
    if cfg.test_only:
        print(trainer.evaluate(0))
    else:
        trainer.train()
        print(trainer.evaluate(-1))


if __name__ == "__main__":
    main()
