"""Segmentation trainer: iter-based, AdamW with paramwise rules, poly LR.

Rebuild of mmseg/apis/train.py:71-194 + the textformer optimizer config
(configs/textformer/*.py:44-75): AdamW 6e-5 (0.9, 0.999) wd 0.01 with the
decode head's lr x10 and no weight decay on norm parameters; poly LR decay
(power 1.0) with 1500-iter linear warmup from ratio 1e-6; periodic eval
via slide inference + intersect_and_union; distributed eval reduces the
per-shard histograms with one psum instead of collect_results_cpu.
"""

from __future__ import annotations

import functools as _functools
import logging
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from fudanocr_tpu.core import checkpoint as ckpt_lib
from fudanocr_tpu.core.mesh import make_mesh, make_mesh_for_batch
from fudanocr_tpu.eval.seg_metrics import intersect_and_union, total_metrics
from fudanocr_tpu.losses.seg_losses import (cross_entropy_loss,
                                            lovasz_softmax_bucketed,
                                            lovasz_softmax_loss, seg_accuracy)
from fudanocr_tpu.models.seg.encoder_decoder import slide_inference
from fudanocr_tpu.train.state import TrainState

log = logging.getLogger("fudanocr_tpu.seg")


def poly_schedule(base_lr: float, total_iters: int, power: float = 1.0,
                  warmup_iters: int = 1500, warmup_ratio: float = 1e-6,
                  min_lr: float = 0.0):
    def schedule(step):
        step = jnp.minimum(step, total_iters)
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio)
                          * jnp.minimum(step, warmup_iters) / warmup_iters)
        poly = (base_lr - min_lr) * (1 - step / total_iters) ** power + min_lr
        return jnp.where(step < warmup_iters, warm, poly)

    return schedule


@_functools.lru_cache(maxsize=32)
def _cached_seg_optimizer(base_lr: float, weight_decay: float,
                          total_iters: int, head_lr_mult: float,
                          top_keys: tuple):
    sched = poly_schedule(base_lr, total_iters)

    def decay_mask(tree):
        return jax.tree_util.tree_map(lambda p: p.ndim > 1, tree)

    # the lr x10 rule applies to the DECODE HEAD subtree specifically
    # (textformer configs paramwise_cfg head_lr_mult); an earlier
    # substring match on "head" would silently misroute any future
    # nesting that happened to contain the word. The label dict over the
    # top-level keys is a valid optax prefix tree.
    labels = {k: ("head" if k in ("decode_head", "auxiliary_head")
                  else "backbone") for k in top_keys}

    def adamw(mult):
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.scale_by_schedule(lambda s: -mult * sched(s)),
        )

    return optax.multi_transform(
        {"backbone": adamw(1.0), "head": adamw(head_lr_mult)}, labels)


def make_seg_optimizer(params, base_lr: float = 6e-5,
                       weight_decay: float = 0.01, total_iters: int = 160_000,
                       head_lr_mult: float = 10.0):
    """AdamW with head lr x10 and no decay on 1-D (norm/bias) params.

    Memoized on the recipe: TrainState stores tx as STATIC jit metadata
    compared by identity (closures), so two trainers with the same recipe
    must receive the *same* GradientTransformation object or every jitted
    step/eval retraces and recompiles from scratch — on the 1-core CPU
    test host that was ~90 s per extra trainer."""
    return _cached_seg_optimizer(base_lr, weight_decay, int(total_iters),
                                 head_lr_mult, tuple(sorted(params.keys())))


def layer_id_for_param(path: str, num_layers) -> int:
    """Depth index of a CascadeMiT param subtree for layer-wise lr decay.

    Mirrors the role of LearningRateDecayOptimizerConstructor's
    get_layer_id_* (mmseg/core/optimizers/layer_decay_optimizer_
    constructor.py): embeddings/stem -> 0, conv pyramid stages 1..3,
    transformer stages by cumulative block index, everything else (head,
    fusion convs) -> max+1."""
    total = sum(num_layers)
    parts = path.split("/")
    top = parts[0]
    if top.startswith("stem"):
        return 0
    if top.startswith("layer") and "_" in top:  # layer{1..3}_{b}
        return int(top[5])
    if top.startswith("stage"):
        stage = int(top[5:])
        off = 3 + sum(num_layers[:stage])
        for p in parts[1:]:
            if p.startswith("layer"):
                return off + int(p[5:])
        return off  # patch embed / final norm of the stage
    return 3 + total + 1


def make_layer_decay_optimizer(params, base_lr: float = 6e-5,
                               weight_decay: float = 0.01,
                               total_iters: int = 160_000,
                               decay_rate: float = 0.9,
                               num_layers=(2, 2, 2, 2)):
    """Layer-wise lr decay: scale = decay_rate^(max_id - layer_id)
    (layer_decay_optimizer_constructor.py:162), AdamW + poly schedule,
    no decay on 1-D params."""
    sched = poly_schedule(base_lr, total_iters)
    max_id = 3 + sum(num_layers) + 1

    def decay_mask(tree):
        return jax.tree_util.tree_map(lambda p: p.ndim > 1, tree)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    ids = sorted({layer_id_for_param(
        "/".join(str(k.key) for k in path), num_layers)
        for path, _ in flat})

    def labels(tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        lab = [f"l{layer_id_for_param('/'.join(str(k.key) for k in p), num_layers)}"
               for p, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, lab)

    def adamw(mult):
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.scale_by_schedule(lambda s: -mult * sched(s)),
        )

    return optax.multi_transform(
        {f"l{i}": adamw(decay_rate ** (max_id - i)) for i in ids}, labels)


def make_seg_train_step(model, mesh, loss_weights: Dict[str, float] = None,
                        det_loss_ratio: float = 0.1,
                        gt_guided_masks: bool = False,
                        wrap_jit: bool = True,
                        lovasz_impl: str = "sort"):
    """batch: {'img', 'gt_seg', optional 'gt_det', optional 'valid'}.

    With a det-guided model and `gt_det` in the batch, the det logits
    train against the LOADED det annotation at full resolution, exactly
    as the reference: decode_head.forward_train unpacks (inputs, det_pred)
    and adds det_loss_ratio x losses(det_pred, gt_det)
    (decode_head.py:244-256; the head's losses() upsamples the 1/4-scale
    det logits to the label size). Without `gt_det` no det loss is added
    (reference plain configs). `gt_guided_masks=True` additionally feeds
    gt_det into the backbone for attention-mask construction
    (EncoderDecoder_V4's gt-threading, encoder_decoder.py:337); the
    published *_det configs use predicted masks (V10), so it defaults off.
    """
    loss_weights = loss_weights or {"ce": 1.0}
    # 'sort' (default, also what 'auto' resolves to) is the exact
    # reference Lovász math; 'bucketed' is the K-bin histogram rewrite
    # (losses/seg_losses.py), kept selectable as a RECORDED NEGATIVE:
    # the full r5 on-chip A/B (scripts/exp_lovasz_r5.py + the canonical
    # bench_seg harness with donated buffers) has sort winning or tying
    # at every recipe shape — plain 512^2 B2 18.9 vs 21.5 ms/step,
    # B8 36.9 vs 36.6 (tie), det 1024^2 B8 366 vs 420 ms. The earlier
    # apparent bucketed win (26.1 vs 28.4) came from a harness variant
    # without buffer donation and did not replicate.
    lovasz = (lovasz_softmax_bucketed if lovasz_impl == "bucketed"
              else lovasz_softmax_loss)
    batch_sharding = NamedSharding(mesh, P("data"))

    def step(state: TrainState, batch, rng):
        img, gt = batch["img"], batch["gt_seg"]
        gt_det = batch.get("gt_det")
        valid = batch.get("valid")
        if valid is not None:  # padded tail samples contribute no loss
            vmask = valid[:, None, None] > 0
            gt = jnp.where(vmask, gt, 255)
            if gt_det is not None:
                gt_det = jnp.where(vmask, gt_det, 255)

        def loss_of(params):
            kwargs = {}
            if gt_guided_masks and gt_det is not None:
                kwargs["det_gt"] = jnp.where(gt_det == 255, 0, gt_det)
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng}, **kwargs)
            det_logits = None
            if isinstance(out, tuple):  # det-guided variant
                logits, det_logits = out
            else:
                logits = out
            loss = 0.0
            aux = {}
            if det_logits is not None and gt_det is not None:
                up = jax.image.resize(
                    det_logits.astype(jnp.float32),
                    (det_logits.shape[0], gt_det.shape[1], gt_det.shape[2],
                     det_logits.shape[3]), "bilinear")
                det_loss = 0.0
                if loss_weights.get("ce"):
                    det_loss += loss_weights["ce"] * cross_entropy_loss(
                        up, gt_det)
                if loss_weights.get("lovasz"):
                    det_loss += loss_weights["lovasz"] * lovasz(up, gt_det)
                aux["det"] = det_loss
                loss = loss + det_loss_ratio * det_loss
            if loss_weights.get("ce"):
                aux["ce"] = cross_entropy_loss(logits, gt)
                loss = loss + loss_weights["ce"] * aux["ce"]
            if loss_weights.get("lovasz"):
                aux["lovasz"] = lovasz(logits, gt)
                loss = loss + loss_weights["lovasz"] * aux["lovasz"]
            aux["acc"] = seg_accuracy(logits, gt)
            return loss, (aux, mutated["batch_stats"])

        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, **aux}

    if not wrap_jit:  # raw step for callers that scan/chain it themselves
        return step
    return jax.jit(step, in_shardings=(None, batch_sharding, None),
                   donate_argnums=(0,))


@_functools.lru_cache(maxsize=32)
def _shared_seg_step(model, mesh, lw_items, det_loss_ratio, gt_guided_masks,
                     lovasz_impl):
    return make_seg_train_step(model, mesh, dict(lw_items),
                               det_loss_ratio=det_loss_ratio,
                               gt_guided_masks=gt_guided_masks,
                               lovasz_impl=lovasz_impl)


@_functools.lru_cache(maxsize=64)
def shared_jitted_init(model):
    """One jitted `model.init` per model config (flax modules hash by
    config): a fresh `jax.jit(model.init)` per trainer means a fresh
    compile cache, so the N-th trainer of the same tiny test model pays
    the full ~50 s init compile again on the 1-core CPU host."""
    return jax.jit(model.init, static_argnames=("train",))


@_functools.lru_cache(maxsize=64)
def _shared_eval_fn(model, crop, stride):
    def fwd(variables, img):
        out = model.apply(variables, img)
        return out[0] if isinstance(out, tuple) else out

    def infer(variables, img):
        if crop is not None:
            return slide_inference(lambda p: fwd(variables, p), img, crop,
                                   stride or crop)
        return fwd(variables, img)

    return jax.jit(infer)


def shared_seg_train_step(model, mesh, loss_weights=None,
                          det_loss_ratio: float = 0.1,
                          gt_guided_masks: bool = False,
                          lovasz_impl: str = "sort"):
    """make_seg_train_step, memoized on the (hashable) recipe.

    Every `jax.jit` wraps a fresh closure, so two SegTrainers with the
    *same* model config otherwise each pay a full XLA compile — flax
    modules are frozen dataclasses (hash = config), so identical recipes
    can share one jitted step (and its compile cache). Falls back to an
    unshared step if anything in the recipe is unhashable."""
    lw_items = tuple(sorted((loss_weights or {"ce": 1.0}).items()))
    try:
        return _shared_seg_step(model, mesh, lw_items, det_loss_ratio,
                                gt_guided_masks, lovasz_impl)
    except TypeError:  # unhashable model/mesh — build a private step
        return make_seg_train_step(model, mesh, dict(lw_items),
                                   det_loss_ratio=det_loss_ratio,
                                   gt_guided_masks=gt_guided_masks,
                                   lovasz_impl=lovasz_impl)


class SegTrainer:
    def __init__(self, model, train_data, eval_data, num_classes: int = 2,
                 batch_size: int = 4, lr: float = 6e-5,
                 total_iters: int = 1000, eval_every: int = 1000,
                 loss_weights: Optional[Dict[str, float]] = None,
                 crop: Optional[Tuple[int, int]] = None,
                 stride: Optional[Tuple[int, int]] = None,
                 ckpt_dir: Optional[str] = None, mesh=None, seed: int = 0,
                 log_dir: Optional[str] = None, det_loss_ratio: float = 0.1,
                 gt_guided_masks: bool = False,
                 ckpt_every: Optional[int] = None, auto_resume: bool = False,
                 max_keep: int = 3, lovasz_impl: str = "sort"):
        self.model = model
        self.train_data = train_data
        self.eval_data = eval_data
        self.num_classes = num_classes
        self.batch_size = batch_size
        self.total_iters = total_iters
        self.eval_every = eval_every
        self.crop = crop
        self.stride = stride
        self.ckpt_dir = ckpt_dir
        self.ckpt_every = ckpt_every or eval_every
        self.max_keep = max_keep
        self.mesh = mesh or make_mesh_for_batch(batch_size)
        # per-iteration rng is FOLDED from the base key (not split
        # sequentially) so a resumed run regenerates the exact dropout
        # stream of the uninterrupted one
        self.base_rng = jax.random.PRNGKey(seed)
        self.start_iter = 0

        first = next(iter(train_data.batches(batch_size)))
        # jit the init: eager flax init dispatches hundreds of per-op
        # compiles, which over the axon tunnel (~1.4 s/dispatch) takes
        # hours instead of seconds
        try:
            init = shared_jitted_init(model)
        except TypeError:       # unhashable model — private jit
            init = jax.jit(model.init, static_argnames=("train",))
        variables = init(
            jax.random.PRNGKey(seed), jnp.asarray(first["img"]), train=True)
        tx = make_seg_optimizer(variables["params"], lr,
                                total_iters=total_iters)
        self.state = TrainState.create(variables["params"],
                                       variables.get("batch_stats", {}), tx)
        self.train_step = shared_seg_train_step(
            model, self.mesh, loss_weights, det_loss_ratio=det_loss_ratio,
            gt_guided_masks=gt_guided_masks, lovasz_impl=lovasz_impl)
        self.best = -1.0
        self.metrics_logger = None
        if log_dir:
            from fudanocr_tpu.core.logging import MetricsLogger
            self.metrics_logger = MetricsLogger(log_dir)
        if auto_resume and ckpt_dir:
            path = ckpt_lib.latest(ckpt_dir, prefix="iter_")
            if path:
                self.resume(path)

    def resume(self, ckpt_path: str):
        """Restore FULL training state (params, batch_stats, optimizer,
        step, best) from a periodic checkpoint — the runner resume_from /
        --auto-resume semantics (mmseg/apis/train.py:186-193)."""
        tree = {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state}
        loaded = ckpt_lib.load(ckpt_path, tree)
        meta = ckpt_lib.load_meta(ckpt_path)
        step = int(meta.get("step", 0))
        self.state = self.state.replace(
            params=loaded["params"], batch_stats=loaded["batch_stats"],
            opt_state=loaded["opt_state"],
            step=jnp.asarray(step, jnp.int32))
        self.best = float(meta.get("best", -1.0))
        self.start_iter = step
        log.info("resumed from %s at iter %d", ckpt_path, step)

    def _save_periodic(self, it: int):
        ckpt_lib.save(f"{self.ckpt_dir}/iter_{it}",
                      {"params": self.state.params,
                       "batch_stats": self.state.batch_stats,
                       "opt_state": self.state.opt_state},
                      meta={"step": it, "best": self.best})
        # CheckpointHook max_keep_ckpts: prune the oldest periodic dirs
        import os
        import shutil
        subs = sorted((d for d in os.listdir(self.ckpt_dir)
                       if d.startswith("iter_")),
                      key=lambda d: int(d[5:]))
        for d in subs[:-self.max_keep]:
            shutil.rmtree(os.path.join(self.ckpt_dir, d),
                          ignore_errors=True)

    def train(self, stop_after: Optional[int] = None):
        """Run to total_iters; `stop_after` aborts early after that many
        iters (simulates a killed run for resume tests — the schedule and
        jitted step stay those of the FULL recipe, exactly like a real
        mid-run death)."""
        it = self.start_iter
        stop = self.total_iters if stop_after is None else stop_after
        while it < min(self.total_iters, stop):
            for batch in self.train_data.batches(self.batch_size,
                                                 shuffle=True, seed=it):
                if it >= min(self.total_iters, stop):
                    break
                rng = jax.random.fold_in(self.base_rng, it)
                self.state, metrics = self.train_step(
                    self.state,
                    {k: jnp.asarray(v) for k, v in batch.items()}, rng)
                it += 1
                if it % 50 == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    log.info("iter %d/%d %s", it, self.total_iters, m)
                    if self.metrics_logger:
                        self.metrics_logger.scalars(m, it, "train/")
                if it % self.eval_every == 0:
                    self.evaluate(it)
                if self.ckpt_dir and it % self.ckpt_every == 0:
                    self._save_periodic(it)
        return self.state

    def evaluate(self, it: int = 0) -> Dict[str, float]:
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}

        if getattr(self, "_eval_fn", None) is None:
            # jit ONCE per (model, crop, stride) — shared across trainers
            # and eval cycles (variables as an argument, both so the 160
            # eval points of a 160k run don't each pay a retrace and so
            # the weights aren't baked into the serialized module — the
            # axon remote-compile rejects constant-heavy payloads)
            try:
                self._eval_fn = _shared_eval_fn(self.model, self.crop,
                                                self.stride)
            except TypeError:   # unhashable model/crop — private jit
                model, crop, stride = self.model, self.crop, self.stride

                def fwd(variables, img):
                    out = model.apply(variables, img)
                    return out[0] if isinstance(out, tuple) else out

                def infer(variables, img):
                    if crop is not None:
                        return slide_inference(lambda p: fwd(variables, p),
                                               img, crop, stride or crop)
                    return fwd(variables, img)

                self._eval_fn = jax.jit(infer)
        infer = lambda img: self._eval_fn(variables, img)
        hist = np.zeros((4, self.num_classes), np.float64)
        for bi, batch in enumerate(self.eval_data.batches(self.batch_size)):
            logits = infer(jnp.asarray(batch["img"]))
            pred = jnp.argmax(logits, axis=-1)
            gt = jnp.asarray(batch["gt_seg"])
            if "valid" in batch:  # padded tail samples count nothing
                gt = jnp.where(
                    jnp.asarray(batch["valid"])[:, None, None] > 0, gt, 255)
            if bi == 0 and self.metrics_logger is not None:
                self.metrics_logger.prediction_table(
                    it, batch["img"], batch["gt_seg"], np.asarray(pred))
            i, u, pa, la = intersect_and_union(pred, gt, self.num_classes)
            hist += np.stack([np.asarray(i), np.asarray(u), np.asarray(pa),
                              np.asarray(la)]).astype(np.float64)
        res = total_metrics(*hist)
        summary = {k: res[k] for k in ("aAcc", "mIoU", "mDice", "mFscore")}
        log.info("eval @%d: %s", it, summary)
        if self.metrics_logger:
            self.metrics_logger.scalars(summary, it, "eval/")
        if self.ckpt_dir and res["mIoU"] >= self.best:
            self.best = res["mIoU"]
            ckpt_lib.save(f"{self.ckpt_dir}/best",
                          {"params": self.state.params,
                           "batch_stats": self.state.batch_stats},
                          meta={"step": int(self.state.step), **summary})
        return summary
