"""LR schedules used across the reference projects.

* cosine warm restarts (OI-CTR / CCR-CLIP stage 2: torch
  CosineAnnealingWarmRestarts(T_0=10), orientation-independent-CTR/
  train.py:30);
* step decay x0.8 every 2 epochs after 10 (CCR-CLIP stage 1,
  main.py:113-116);
* poly+warmup lives in train/seg.py (textformer).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warm_restarts(base_lr: float, t0: int, t_mult: int = 1,
                         eta_min: float = 0.0):
    """SGDR schedule; `t0` in steps (torch counts epochs — multiply by
    steps/epoch when wiring up)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(step, t0)
            t_i = float(t0)
        else:
            # closed form for geometric restarts
            n = jnp.floor(jnp.log1p(step / t0 * (t_mult - 1))
                          / jnp.log(float(t_mult)))
            start = t0 * (t_mult ** n - 1) / (t_mult - 1)
            t_cur = step - start
            t_i = t0 * t_mult ** n
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * t_cur / t_i))

    return schedule


def step_decay_after(base_lr: float, start_epoch: int = 10,
                     every: int = 2, factor: float = 0.8,
                     steps_per_epoch: int = 1):
    """x`factor` every `every` epochs once past `start_epoch`."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
        n = jnp.maximum(jnp.floor((epoch - start_epoch) / every), 0.0)
        return base_lr * factor ** n

    return schedule
