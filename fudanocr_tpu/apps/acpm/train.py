"""ACPM (augmented character profile matching) entry point.

Mirrors character-profile-matching/train.py + config.py: radical-decoder
CE + printed-template feature MSE + radical-count loss (L1 or CE) +
stroke-orientation-count MSE + stroke-length MSE (weight 0.01 when
pretraining, else 1 with per-sample sum normalisation); Adadelta lr 1.0;
test-time profile matching over Levenshtein candidates.

Profile tables ({3755,ctw}_rad_num/stroke_num/stroke_len, decompose.txt)
come from configured paths (the reference ships them in data/); without
them a synthetic profile system is generated for tests/demo.
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
from fudanocr_tpu.train.ctr import masked_token_ce
from fudanocr_tpu.train.state import TrainState

log = logging.getLogger("fudanocr_tpu.acpm")

DEFAULT_CONFIG = Config({
    "epoch": 1, "lr": 1.0, "batch": 32, "val_frequency": 1000,
    "image_size": 32, "max_len": 12,
    "train_dataset": "", "test_dataset": "",
    "decompose_path": "", "rad_num_path": "", "stroke_num_path": "",
    "stroke_len_path": "",
    "encoder": "resnet", "rn_loss": "L1", "stn": False, "pretrain": False,
    "candidate_search_range": 0,
    "ckpt_dir": "./ckpt/acpm", "synthetic_samples": 64, "test_only": False,
    # "" = reference depth [3,4,6,3]; smokes pass e.g. "1,1,1,1"
    "encoder_layers": "",
    # smoke-test shrink knobs (reference: d_model 1024, div 1)
    "d_model": 1024, "encoder_width_div": 1,
})


def build_profiles(cfg):
    """-> (charset, decomposition dict, r_num, s_num, s_len tables)."""
    if cfg.decompose_path:
        from fudanocr_tpu.data.codecs import load_decomposition_table
        table = {k: v.replace(" ", "") for k, v in
                 load_decomposition_table(cfg.decompose_path,
                                          "colon").items()}
        charset = sorted(table.keys())

        def load_vec(path, dim):
            rows = {}
            for ln in open(path, encoding="utf-8"):
                parts = ln.split()
                if len(parts) >= dim + 1:
                    rows[parts[0]] = np.asarray([float(x) for x in
                                                 parts[1:dim + 1]],
                                                np.float32)
            return rows

        r_num = {ch: float(len(table[ch])) for ch in charset}
        s_num = (load_vec(cfg.stroke_num_path, 4) if cfg.stroke_num_path
                 else {ch: np.ones(4, np.float32) for ch in charset})
        s_len = (load_vec(cfg.stroke_len_path, 4) if cfg.stroke_len_path
                 else {ch: np.ones(4, np.float32) for ch in charset})
        if cfg.rad_num_path:
            for ln in open(cfg.rad_num_path, encoding="utf-8"):
                parts = ln.split()
                if len(parts) >= 2:
                    r_num[parts[0]] = float(parts[1])
    else:
        import random, string
        rng = random.Random(0)
        radicals = "abcdefghij"
        charset = list(string.ascii_uppercase + string.digits)
        table = {ch: "".join(rng.choice(radicals)
                             for _ in range(rng.randint(2, 5)))
                 for ch in charset}
        r_num = {ch: float(len(table[ch])) for ch in charset}
        s_num = {ch: np.asarray([rng.randint(1, 5) for _ in range(4)],
                                np.float32) for ch in charset}
        s_len = {ch: np.asarray([rng.uniform(1, 4) for _ in range(4)],
                                np.float32) for ch in charset}
    return charset, table, r_num, s_num, s_len


class ACPMTrainer:
    def __init__(self, cfg):
        from fudanocr_tpu.data.codecs import SequenceCodec
        from fudanocr_tpu.data.rec_dataset import (RecLMDBDataset,
                                                   SyntheticCharDataset)
        from fudanocr_tpu.models.rec.acpm import ACPM

        self.cfg = cfg
        self.charset, self.table, self.r_num, self.s_num, self.s_len = \
            build_profiles(cfg)
        radset = sorted({r for v in self.table.values() for r in v})
        self.codec = SequenceCodec(["<"] + radset + ["$"], self.table,
                                   terminator="$")
        self.legal_radicals = [self.table[ch] for ch in self.charset]

        size = (cfg.image_size, cfg.image_size)
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

        enc_layers = (tuple(int(x) for x in str(cfg.encoder_layers).split(","))
                      if cfg.encoder_layers else None)
        self.model = ACPM(vocab=self.codec.num_classes, encoder=cfg.encoder,
                          rn_loss=cfg.rn_loss, stn=cfg.stn,
                          d_model=cfg.d_model, encoder_layers=enc_layers,
                          encoder_width_div=cfg.encoder_width_div)
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), jnp.zeros((2, *size, 3)),
            jnp.zeros((2, cfg.max_len), jnp.int32), train=True)
        tx = optax.adadelta(cfg.lr, rho=0.9, eps=1e-6)
        self.state = TrainState.create(variables["params"],
                                       variables.get("batch_stats", {}), tx)
        self.train_step = self._make_train_step()
        self.best_acc = -1.0

    def _make_train_step(self):
        model, cfg = self.model, self.cfg

        def step(state, batch, rng):
            def loss_of(params):
                vs = {"params": params, "batch_stats": state.batch_stats}
                out, mutated = model.apply(
                    vs, batch["image"], batch["text_input"], train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                decode_loss = masked_token_ce(out["pred"], batch["text_gt"],
                                              batch["lengths"])
                # printed-template feature MSE (train.py:96-99): encode the
                # template images with the same (current) encoder
                print_memory = model.apply(vs, batch["print_image"],
                                           method=model.encode)
                feature_loss = jnp.mean(
                    (out["conv"].astype(jnp.float32)
                     - jax.lax.stop_gradient(
                         print_memory.astype(jnp.float32))) ** 2)
                if cfg.rn_loss == "L1":
                    rn_loss = jnp.mean(jnp.abs(out["r_num"].astype(jnp.float32)
                                               - batch["r_num"]))
                else:
                    logp = jnp.log(jnp.maximum(out["r_num"], 1e-8))
                    rn_loss = -jnp.mean(jnp.take_along_axis(
                        logp, batch["r_num"].astype(jnp.int32)[:, None],
                        axis=-1))
                sn_loss = jnp.mean((out["s_num"].astype(jnp.float32)
                                    - batch["s_num"]) ** 2)
                s_len_gt = batch["s_len"]
                if not cfg.pretrain:
                    # normalise gt lengths to the predicted sums
                    pred_sum = jnp.sum(out["s_len"].astype(jnp.float32),
                                       axis=1, keepdims=True)
                    gt_sum = jnp.maximum(jnp.sum(s_len_gt, axis=1,
                                                 keepdims=True), 1e-6)
                    s_len_gt = s_len_gt / gt_sum * pred_sum
                sl_loss = jnp.mean((out["s_len"].astype(jnp.float32)
                                    - s_len_gt) ** 2)
                sl_w = 0.01 if cfg.pretrain else 1.0
                total = decode_loss + feature_loss + rn_loss + sn_loss \
                    + sl_w * sl_loss
                return total, mutated["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            return state.apply_gradients(grads, new_batch_stats=new_bs), loss

        return jax.jit(step, donate_argnums=(0,))

    def _render_print(self, labels):
        """printed-template images for the feature loss (PIL stand-in for
        the reference's printstandard dirs)."""
        from fudanocr_tpu.apps.oictr.train import render_char_templates
        if not hasattr(self, "_print_cache"):
            self._print_cache = render_char_templates(
                self.charset, self.cfg.image_size)
        return np.stack([self._print_cache[l] for l in labels])

    def _device_batch(self, images, labels):
        cfg = self.cfg
        text_input, text_gt, lengths = self.codec.encode(labels, cfg.max_len)
        return {"image": jnp.asarray(images),
                "print_image": jnp.asarray(self._render_print(labels)),
                "text_input": jnp.asarray(text_input),
                "text_gt": jnp.asarray(text_gt),
                "lengths": jnp.asarray(lengths),
                "r_num": jnp.asarray([self.r_num[l] for l in labels],
                                     jnp.float32),
                "s_num": jnp.asarray(np.stack([self.s_num[l]
                                               for l in labels])),
                "s_len": jnp.asarray(np.stack([self.s_len[l]
                                               for l in labels]))}

    def train(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(0)
        it = 0
        for epoch in range(cfg.epoch):
            for images, labels in self.train_data.batches(cfg.batch):
                rng, srng = jax.random.split(rng)
                self.state, loss = self.train_step(
                    self.state, self._device_batch(images, labels), srng)
                it += 1
                if it % 50 == 0:
                    log.info("epoch %d iter %d loss %.4f", epoch, it,
                             float(loss))
                if it % cfg.val_frequency == 0:
                    self.evaluate(it)
        return self.state

    def evaluate(self, it: int = 0) -> Dict[str, float]:
        from fudanocr_tpu.eval.profile_matching import (get_candidates,
                                                        select_candidate)
        from fudanocr_tpu.models.rec.ocr_transformer import greedy_decode

        cfg = self.cfg
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        encode = jax.jit(lambda v, im: self.model.apply(
            v, im, method=self.model.encode))
        fwd = jax.jit(lambda v, im, ti: self.model.apply(v, im, ti))

        # printed-template profile features for all chars
        prints = self._render_print(self.charset)
        profile_features = {}
        for s in range(0, len(self.charset), 64):
            mem = np.asarray(encode(variables,
                                    jnp.asarray(prints[s:s + 64])))
            for j in range(mem.shape[0]):
                profile_features[s + j] = mem[j]
        profile_r = [self.r_num[ch] for ch in self.charset]
        profile_sn = [self.s_num[ch] for ch in self.charset]
        profile_sl = [self.s_len[ch] for ch in self.charset]

        correct, total = 0, 0
        for images, labels in self.test_data.batches(cfg.batch):
            ids = np.asarray(greedy_decode(self.model, variables,
                                           jnp.asarray(images), cfg.max_len))
            out = fwd(variables, jnp.asarray(images),
                      jnp.zeros((len(labels), cfg.max_len), jnp.int32))
            conv = np.asarray(out["conv"])
            r_num = np.asarray(out["r_num"])
            s_num = np.asarray(out["s_num"])
            s_len = np.asarray(out["s_len"])
            for b, (row, lab) in enumerate(zip(ids, labels)):
                toks = []
                for t in row:
                    tok = self.codec.alphabet[int(t)]
                    if tok == "$":
                        break
                    toks.append(tok)
                pred = "".join(toks)
                cands = get_candidates(pred, self.legal_radicals,
                                       cfg.candidate_search_range)
                if len(cands) == 1:
                    pick = cands[0]
                else:
                    pick = select_candidate(
                        cands, conv[b], float(r_num[b]), s_num[b], s_len[b],
                        profile_features, profile_r, profile_sn, profile_sl)
                correct += int(self.charset[pick] == lab)
                total += 1
        acc = correct / max(total, 1)
        log.info("eval @%d: acc %.4f (%d/%d)", it, acc, correct, total)
        if cfg.ckpt_dir and acc >= self.best_acc:
            self.best_acc = acc
            ckpt_lib.save(f"{cfg.ckpt_dir}/best",
                          {"params": self.state.params,
                           "batch_stats": self.state.batch_stats},
                          meta={"step": int(self.state.step), "acc": acc})
        return {"acc": acc}


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="ACPM radical CCR")
    p.add_argument("--options", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = merge_cli_overrides(DEFAULT_CONFIG, args.options)
    trainer = ACPMTrainer(cfg)
    if cfg.test_only:
        print(trainer.evaluate(0))
    else:
        trainer.train()
        print(trainer.evaluate(-1))


if __name__ == "__main__":
    main()
