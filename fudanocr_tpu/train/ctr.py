"""CTR (Chinese text/character recognition) trainer.

One trainer for the four reference forks (SLD, image-ids-CTR, OI-CTR, ACPM
— SURVEY.md §2.9): teacher-forced CE training of the shared OCRTransformer
with Adadelta (sld/train.py:35-39), periodic autoregressive eval via the
static-shape greedy decoder, host-side rectification (Levenshtein snap for
stroke mode), and best-checkpoint tracking (sld/train.py:80-176).

The ragged `text_all` packing of the reference (util.py:108-116) is a
masked dense CE here; parity on the mean: both average per-token CE over
real tokens only.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from fudanocr_tpu.core import checkpoint as ckpt_lib
from fudanocr_tpu.core.mesh import make_mesh, make_mesh_for_batch
from fudanocr_tpu.models.rec.ocr_transformer import greedy_decode
from fudanocr_tpu.train.state import TrainState

log = logging.getLogger("fudanocr_tpu.ctr")


def masked_token_ce(logits: jax.Array, targets: jax.Array,
                    lengths: jax.Array) -> jax.Array:
    """Mean CE over valid positions of (B, L, C) logits vs (B, L) ids."""
    l = targets.shape[1]
    mask = (jnp.arange(l)[None, :] < lengths[:, None]).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_ctr_train_step(model, mesh, loss_fn: Optional[Callable] = None,
                        wrap_jit: bool = True):
    batch_sharding = NamedSharding(mesh, P("data"))
    loss_fn = loss_fn or (lambda out, batch: masked_token_ce(
        out["pred"], batch["text_gt"], batch["lengths"]))

    def step(state: TrainState, batch, rng):
        def loss_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], batch["text_input"], train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            return loss_fn(out, batch), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss

    if not wrap_jit:  # raw step for callers that scan/chain it themselves
        return step
    return jax.jit(step, in_shardings=(
        None, {k: batch_sharding for k in ("image", "text_input", "text_gt",
                                           "lengths")}, None),
        donate_argnums=(0,))


class CTRTrainer:
    def __init__(self, model, codec, train_data, eval_data,
                 batch_size: int = 32, lr: float = 1.0,
                 weight_decay: float = 0.0, epochs: int = 1,
                 eval_every: int = 1000, max_len: int = 30,
                 rectifier=None, ckpt_dir: Optional[str] = None,
                 mesh=None, seed: int = 0, image_size=(32, 32),
                 loss_fn: Optional[Callable] = None):
        self.model = model
        self.codec = codec
        self.train_data = train_data
        self.eval_data = eval_data
        self.batch_size = batch_size
        self.epochs = epochs
        self.eval_every = eval_every
        self.max_len = max_len
        self.rectifier = rectifier
        self.ckpt_dir = ckpt_dir
        self.mesh = mesh or make_mesh_for_batch(batch_size)
        self.rng = jax.random.PRNGKey(seed)
        self.image_size = image_size

        tx_parts = [optax.adadelta(lr, rho=0.9, eps=1e-6)]
        if weight_decay:
            tx_parts.insert(0, optax.add_decayed_weights(weight_decay))
        tx = optax.chain(*tx_parts)

        h, w = image_size
        variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((2, h, w, 3)),
            jnp.zeros((2, max_len), jnp.int32), train=True)
        self.state = TrainState.create(variables["params"],
                                       variables.get("batch_stats", {}), tx)
        self.train_step = make_ctr_train_step(model, self.mesh, loss_fn)
        self.best_acc = -1.0
        self.history = []

    def _device_batch(self, images, labels):
        text_input, text_gt, lengths = self.codec.encode(labels, self.max_len)
        return {"image": jnp.asarray(images),
                "text_input": jnp.asarray(text_input),
                "text_gt": jnp.asarray(text_gt),
                "lengths": jnp.asarray(lengths)}

    def train(self):
        it = 0
        for epoch in range(self.epochs):
            for images, labels in self.train_data.batches(self.batch_size):
                batch = self._device_batch(images, labels)
                self.rng, rng = jax.random.split(self.rng)
                self.state, loss = self.train_step(self.state, batch, rng)
                it += 1
                if it % 50 == 0:
                    log.info("epoch %d iter %d loss %.4f", epoch, it,
                             float(loss))
                if it % self.eval_every == 0:
                    self.evaluate(it)
        return self.state

    def decode_batch(self, images) -> list:
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        ids = np.asarray(greedy_decode(self.model, variables,
                                       jnp.asarray(images), self.max_len))
        out = []
        for row in ids:
            toks = []
            for t in row:
                tok = self.codec.alphabet[int(t)]
                if tok == self.codec.terminator:
                    break
                toks.append(tok)
            s = "".join(toks)
            if self.rectifier is not None:
                s = self.rectifier(s)
            out.append(s)
        return out

    def evaluate(self, it: int = 0) -> Dict[str, float]:
        total, correct = 0, 0
        for images, labels in self.eval_data.batches(self.batch_size):
            preds = self.decode_batch(images)
            for p, gt_label in zip(preds, labels):
                gt = "".join(self.codec.decompose(gt_label))
                if self.codec.terminator and gt.endswith(self.codec.terminator):
                    gt = gt[:-len(self.codec.terminator)]
                correct += int(p == gt)
                total += 1
        acc = correct / max(total, 1)
        self.history.append({"iter": it, "acc": acc})
        log.info("eval @%d: acc %.4f (%d/%d)", it, acc, correct, total)
        if self.ckpt_dir and acc >= self.best_acc:
            self.best_acc = acc
            ckpt_lib.save(f"{self.ckpt_dir}/best",
                          {"params": self.state.params,
                           "batch_stats": self.state.batch_stats},
                          meta={"step": int(self.state.step), "acc": acc})
        return {"acc": acc}
