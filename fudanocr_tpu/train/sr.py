"""SR training: jitted data-parallel train/eval steps + trainer loop.

Replaces the reference SR trainer (scene-text-telescope/interfaces/
super_resolution.py:37-239): the epoch loop, loss x100 + grad-clip 0.25,
periodic validation with PSNR/SSIM + CRNN accuracy, and best-checkpoint
tracking. The nn.DataParallel scatter/gather (interfaces/base.py:179)
becomes a batch-sharded jit over the ('data','model') mesh — XLA inserts
the gradient all-reduce over ICI.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fudanocr_tpu.core import checkpoint as ckpt_lib
from fudanocr_tpu.core.mesh import make_mesh, make_mesh_for_batch
from fudanocr_tpu.eval.ctc import CTCLabelConverter, ctc_greedy_decode
from fudanocr_tpu.eval.metrics import psnr, ssim, sequence_accuracy
from fudanocr_tpu.losses.sr_losses import encode_text_labels
from fudanocr_tpu.train.state import TrainState

log = logging.getLogger("fudanocr_tpu.sr")


def make_sr_train_step(model, loss_fn, mesh, loss_scale: float = 100.0,
                       wrap_jit: bool = True):
    """Build the jitted, batch-sharded train step.

    `loss_fn(sr, hr, text_input, text_gt, lengths) -> (loss, aux)`;
    the x100 scaling before grad (super_resolution.py:79) is kept so the
    0.25 grad-norm clip bites at the same point as the reference.
    `wrap_jit=False` returns the raw step for callers that scan it.
    """
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        def loss_of(params):
            sr, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["lr"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            # a precomputed frozen-oracle HR map ("hr_map" in the batch)
            # removes the dominant oracle forward from the step — the
            # presence of the key is jit-static, so each variant compiles
            # once
            extra = ({"hr_map": batch["hr_map"]} if "hr_map" in batch else {})
            loss, aux = loss_fn(sr, batch["hr"], batch["text_input"],
                                batch["text_gt"], batch["lengths"], **extra)
            return loss * loss_scale, (aux, mutated["batch_stats"])

        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, **aux}

    if not wrap_jit:
        return step

    def shardings(batch):
        return (None, {k: batch_sharding for k in batch}, replicated)

    jitted = {}

    def dispatch(state, batch, rng):
        key = tuple(sorted(batch))
        if key not in jitted:
            jitted[key] = jax.jit(step, in_shardings=shardings(batch),
                                  donate_argnums=(0,))
        return jitted[key](state, batch, rng)

    return dispatch


def make_sr_eval_step(model, mesh, recognizer=None):
    """SR forward + PSNR/SSIM (+ CTC argmax ids if a CRNN is given)."""
    batch_sharding = NamedSharding(mesh, P("data"))

    def step(variables, lr_imgs, hr_imgs, rec_variables=None):
        # images live in [0,1] (ToTensor semantics); tanh merely bounds the
        # generator output, as in the reference
        sr = model.apply(variables, lr_imgs)
        sr01 = sr.astype(jnp.float32)
        out = {"sr": sr,
               "psnr": psnr(sr01[..., :3], hr_imgs[..., :3]),
               "ssim": ssim(sr01[..., :3], hr_imgs[..., :3])}
        if recognizer is not None and rec_variables is not None:
            # the reference bicubics SR output to 32x100 then converts to
            # 1-channel gray (0.299/0.587/0.114) before its CRNN(32,1,37,256)
            # evaluator (interfaces/base.py:310,319-325 parse_crnn_data)
            from fudanocr_tpu.models.rec.crnn import parse_crnn_input
            logits = recognizer.apply(rec_variables, parse_crnn_input(sr))
            out["rec_ids"] = ctc_greedy_decode(logits)
        return out

    return jax.jit(step, in_shardings=(None, batch_sharding, batch_sharding,
                                       None))


class SRTrainer:
    """Epoch loop with periodic eval and best-checkpoint tracking."""

    def __init__(self, model, loss_fn, train_data, eval_data,
                 batch_size: int = 64, lr: float = 1e-4,
                 epochs: int = 2, eval_every: int = 1000,
                 max_label_len: int = 32,
                 ckpt_dir: Optional[str] = None,
                 recognizer=None, rec_variables=None,
                 converter: Optional[CTCLabelConverter] = None,
                 mesh=None, seed: int = 1234,
                 log_dir: Optional[str] = None):
        from fudanocr_tpu.train.state import adam_with_clip

        self.model = model
        self.loss_fn = loss_fn
        self.train_data = train_data
        self.eval_data = eval_data
        self.batch_size = batch_size
        self.epochs = epochs
        self.eval_every = eval_every
        self.max_label_len = max_label_len
        self.ckpt_dir = ckpt_dir
        self.recognizer = recognizer
        self.rec_variables = rec_variables
        self.converter = converter
        self.mesh = mesh or make_mesh_for_batch(batch_size)
        self.rng = jax.random.PRNGKey(seed)

        sample_hr, sample_lr, _ = next(iter(self._batches(train_data)))
        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.asarray(sample_lr), train=True)
        self.state = TrainState.create(variables["params"],
                                       variables.get("batch_stats", {}),
                                       adam_with_clip(lr))
        self.train_step = make_sr_train_step(model, loss_fn, self.mesh)
        self.eval_step = make_sr_eval_step(model, self.mesh, recognizer)
        # frozen-oracle HR maps are constants per sample: cache them in
        # host RAM across epochs (keyed by batch ordinal — iteration order
        # is deterministic) so steps after epoch 0 skip the HR oracle
        # forward entirely. ~64 KB/sample; capped below.
        self._use_hr_cache = (
            hasattr(loss_fn, "hr_oracle_map")
            and getattr(loss_fn, "text_focus", False)
            and getattr(loss_fn, "oracle", None) is not None)
        self._hr_map_fn = None
        self._hr_map_cache: Dict[int, np.ndarray] = {}
        self._hr_cache_bytes = 0
        self.hr_cache_cap_bytes = 4 << 30
        self.history = []
        self.best = {"acc": -1.0, "psnr": -1.0}
        self.metrics_logger = None
        if log_dir:
            from fudanocr_tpu.core.logging import MetricsLogger
            self.metrics_logger = MetricsLogger(log_dir)

    def resume(self, ckpt_path: str):
        """Restore params/batch_stats from a checkpoint dir (the reference's
        --resume, interfaces/base.py:181-187)."""
        tree = {"params": self.state.params,
                "batch_stats": self.state.batch_stats}
        loaded = ckpt_lib.load(ckpt_path, tree)
        self.state = self.state.replace(params=loaded["params"],
                                        batch_stats=loaded["batch_stats"])
        log.info("resumed from %s", ckpt_path)

    def _batches(self, data):
        return data.batches(self.batch_size)

    def _hr_map(self, ordinal: int, batch) -> jax.Array:
        """Cached frozen-oracle HR attention map for the batch at this
        epoch ordinal (see __init__; parity test in
        tests/test_sr_train_smoke.py)."""
        cached = self._hr_map_cache.get(ordinal)
        if cached is not None:
            return jnp.asarray(cached)
        if self._hr_map_fn is None:
            self._hr_map_fn = jax.jit(self.loss_fn.hr_oracle_map)
        m = self._hr_map_fn(batch["hr"], batch["text_input"])
        if self._hr_cache_bytes < self.hr_cache_cap_bytes:
            host = np.asarray(m)
            self._hr_map_cache[ordinal] = host
            self._hr_cache_bytes += host.nbytes
        return m

    def _device_batch(self, hr, lr, labels):
        text_input, text_gt, lengths = encode_text_labels(
            labels, self.max_label_len)
        return {"hr": jnp.asarray(hr),
                "lr": jnp.asarray(lr),
                "text_input": jnp.asarray(text_input),
                "text_gt": jnp.asarray(text_gt),
                "lengths": jnp.asarray(lengths)}

    def train(self):
        from fudanocr_tpu.data.prefetch import prefetch

        it = 0
        for epoch in range(self.epochs):
            # host decode/collate/label-encode runs one batch ahead on a
            # background thread while the device executes (SURVEY.md §7.7)
            batches = prefetch(self._batches(self.train_data),
                               transform=lambda b: self._device_batch(*b))
            for bi, batch in enumerate(batches):
                if self._use_hr_cache:
                    batch = dict(batch)
                    batch["hr_map"] = self._hr_map(bi, batch)
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, metrics = self.train_step(self.state, batch,
                                                      step_rng)
                it += 1
                if it % 50 == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    log.info("epoch %d iter %d %s", epoch, it, m)
                    if self.metrics_logger:
                        self.metrics_logger.scalars(m, it, "train/")
                if it % self.eval_every == 0:
                    self.evaluate(it)
        return self.state

    def demo(self, out_dir: str, n_vis: int = 10):
        """Write LR|SR|HR comparison strips to `out_dir` (the reference's
        --demo / vis_dir image dumps, super_resolution.py:331-425)."""
        import os

        from PIL import Image

        os.makedirs(out_dir, exist_ok=True)
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        written = 0
        for hr, lr, labels in self._batches(self.eval_data):
            out = self.eval_step(variables, jnp.asarray(lr), jnp.asarray(hr),
                                 self.rec_variables)
            sr = np.clip(np.asarray(out["sr"], np.float32), 0, 1)
            for i in range(sr.shape[0]):
                if written >= n_vis:
                    return out_dir
                h, w = hr.shape[1], hr.shape[2]
                lr_up = np.asarray(Image.fromarray(
                    (lr[i, ..., :3] * 255).astype(np.uint8)).resize(
                        (w, h), Image.BICUBIC), np.float32) / 255.0
                strip = np.concatenate(
                    [lr_up, sr[i, ..., :3], hr[i, ..., :3]], axis=1)
                Image.fromarray((strip * 255).astype(np.uint8)).save(
                    os.path.join(out_dir,
                                 f"{written:03d}_{labels[i]}.png"))
                written += 1
        return out_dir

    def _evaluate_one(self, data) -> Dict[str, float]:
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        psnrs, ssims, preds, gts = [], [], [], []
        for hr, lr, labels in data.batches(self.batch_size):
            out = self.eval_step(variables, jnp.asarray(lr),
                                 jnp.asarray(hr), self.rec_variables)
            psnrs.append(float(out["psnr"]))
            ssims.append(float(out["ssim"]))
            if "rec_ids" in out and self.converter is not None:
                preds.extend(self.converter.decode_ids(np.asarray(
                    out["rec_ids"])))
                gts.extend(labels)
        res = {"psnr": float(np.mean(psnrs)) if psnrs else 0.0,
               "ssim": float(np.mean(ssims)) if ssims else 0.0}
        if gts:
            res["acc"] = sequence_accuracy(preds, gts)
        return res

    def evaluate(self, it: int = 0) -> Dict[str, float]:
        """eval_data may be one dataset or a dict of difficulty buckets
        (easy/medium/hard, super_resolution.py:103-135); the best checkpoint
        tracks the SUMMED accuracy across buckets as the reference does."""
        if isinstance(self.eval_data, dict):
            res: Dict[str, float] = {}
            acc_sum = 0.0
            for name, data in self.eval_data.items():
                bucket = self._evaluate_one(data)
                log.info("eval[%s] @%d: %s", name, it, bucket)
                for k, v in bucket.items():
                    res[f"{name}_{k}"] = v
                acc_sum += bucket.get("acc", bucket["psnr"])
            res["acc"] = acc_sum
        else:
            res = self._evaluate_one(self.eval_data)
        self.history.append({"iter": it, **res})
        log.info("eval @%d: %s", it, res)
        if self.metrics_logger:
            self.metrics_logger.scalars(res, it, "eval/")
        if self.ckpt_dir and res.get("acc", res.get("psnr", 0.0)) >= \
                self.best.get("acc", -1.0):
            self.best = res
            ckpt_lib.save(f"{self.ckpt_dir}/best",
                          {"params": self.state.params,
                           "batch_stats": self.state.batch_stats},
                          meta={"step": int(self.state.step), **res})
        return res
