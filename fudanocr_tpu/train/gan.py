"""Adversarial SR training (ESRGAN path, text-gestalt/model/esrgan.py).

Alternating generator/discriminator steps: G minimises pixel L1 +
lambda_adv * non-saturating GAN loss, D the standard real/fake BCE — the
training recipe the reference's ESRGAN baseline implies (the repo vendors
the nets; the GAN loop itself lives in the authors' training scripts).
Both steps are separate jitted programs over the data-sharded mesh.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from fudanocr_tpu.core.mesh import make_mesh_for_batch
from fudanocr_tpu.losses.aux_losses import (gan_discriminator_loss,
                                            gan_generator_loss)
from fudanocr_tpu.train.state import TrainState

log = logging.getLogger("fudanocr_tpu.gan")


class GANSRTrainer:
    def __init__(self, generator, discriminator, train_data,
                 batch_size: int = 16, g_lr: float = 1e-4, d_lr: float = 1e-4,
                 lambda_adv: float = 5e-3, lambda_pix: float = 1.0,
                 epochs: int = 1, mesh=None, seed: int = 0):
        self.g = generator
        self.d = discriminator
        self.train_data = train_data
        self.batch_size = batch_size
        self.epochs = epochs
        self.mesh = mesh or make_mesh_for_batch(batch_size)
        self.rng = jax.random.PRNGKey(seed)

        hr, lr, _ = next(iter(train_data.batches(batch_size)))
        g_vars = generator.init(jax.random.PRNGKey(seed),
                                jnp.asarray(lr), train=True)
        d_vars = discriminator.init(jax.random.PRNGKey(seed + 1),
                                    jnp.asarray(hr), train=True)
        self.g_state = TrainState.create(
            g_vars["params"], g_vars.get("batch_stats", {}),
            optax.adam(g_lr, b1=0.9))
        self.d_state = TrainState.create(
            d_vars["params"], d_vars.get("batch_stats", {}),
            optax.adam(d_lr, b1=0.9))
        self.lambda_adv = lambda_adv
        self.lambda_pix = lambda_pix
        self._build_steps()

    def _build_steps(self):
        g, d = self.g, self.d
        lam_adv, lam_pix = self.lambda_adv, self.lambda_pix
        sharding = NamedSharding(self.mesh, P("data"))

        def g_step(g_state, d_state, lr_img, hr_img, rng):
            def loss_of(params):
                sr, mut = g.apply(
                    {"params": params, "batch_stats": g_state.batch_stats},
                    lr_img, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                fake_logits = d.apply(
                    {"params": d_state.params,
                     "batch_stats": d_state.batch_stats}, sr)
                pix = jnp.mean(jnp.abs(sr.astype(jnp.float32)
                                       - hr_img.astype(jnp.float32)))
                adv = gan_generator_loss(fake_logits)
                return lam_pix * pix + lam_adv * adv, \
                    ({"pix": pix, "g_adv": adv}, mut["batch_stats"])

            (loss, (aux, new_bs)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(g_state.params)
            return g_state.apply_gradients(grads, new_batch_stats=new_bs), \
                aux

        def d_step(d_state, g_state, lr_img, hr_img, rng):
            sr = g.apply({"params": g_state.params,
                          "batch_stats": g_state.batch_stats}, lr_img)
            sr = jax.lax.stop_gradient(sr)

            def loss_of(params):
                vs = {"params": params, "batch_stats": d_state.batch_stats}
                real, mut = d.apply(vs, hr_img, train=True,
                                    mutable=["batch_stats"])
                fake, _ = d.apply(vs, sr, train=True,
                                  mutable=["batch_stats"])
                return gan_discriminator_loss(real, fake), mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_of, has_aux=True)(d_state.params)
            return d_state.apply_gradients(grads, new_batch_stats=new_bs), \
                loss

        self.g_step = jax.jit(g_step, in_shardings=(
            None, None, sharding, sharding, None))
        self.d_step = jax.jit(d_step, in_shardings=(
            None, None, sharding, sharding, None))

    def train(self) -> Dict[str, float]:
        last = {}
        for epoch in range(self.epochs):
            for hr, lr, _ in self.train_data.batches(self.batch_size):
                hr_img, lr_img = jnp.asarray(hr), jnp.asarray(lr)
                self.rng, r1, r2 = jax.random.split(self.rng, 3)
                self.d_state, d_loss = self.d_step(self.d_state, self.g_state,
                                                   lr_img, hr_img, r1)
                self.g_state, aux = self.g_step(self.g_state, self.d_state,
                                                lr_img, hr_img, r2)
                last = {"d_loss": float(d_loss),
                        **{k: float(v) for k, v in aux.items()}}
        log.info("gan train done: %s", last)
        return last
