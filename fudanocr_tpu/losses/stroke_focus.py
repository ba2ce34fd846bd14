"""Stroke-focus loss (Text Gestalt, AAAI-22).

Rebuild of text-gestalt/loss/stroke_focus_loss.py:20-125: MSE plus
stroke_lambda x L1 between the stroke-level attention maps of a frozen
stroke-decomposition transformer run on HR vs SR (recognition CE is
disabled, `recognition_loss = -1`). The oracle is the same shared
OCRTransformer with vocab=10 (stroke digit classes) and a 1-channel
encoder, mirroring transformer_english_decomposition.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fudanocr_tpu.losses.sr_losses import to_gray


class StrokeFocusLoss:
    def __init__(self, oracle_model, oracle_variables,
                 stroke_lambda: float = 50.0, text_focus: bool = True):
        self.oracle = oracle_model
        self.oracle_vars = oracle_variables
        self.stroke_lambda = stroke_lambda
        self.text_focus = text_focus

    def hr_oracle_map(self, hr: jax.Array, text_input: jax.Array) -> jax.Array:
        """Frozen-oracle HR attention map — cacheable per sample, see
        TextFocusLoss.hr_oracle_map."""
        return self.oracle.apply(self.oracle_vars, to_gray(hr),
                                 text_input)["map"]

    def __call__(self, sr: jax.Array, hr: jax.Array, text_input: jax.Array,
                 text_gt: jax.Array, lengths: jax.Array,
                 hr_map: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        mse = jnp.mean((sr.astype(jnp.float32) - hr.astype(jnp.float32)) ** 2)
        if not self.text_focus:
            return mse, {"mse": mse}

        if hr_map is None:
            hr_map = self.hr_oracle_map(hr, text_input)
        sr_out = self.oracle.apply(self.oracle_vars, to_gray(sr), text_input)

        l = text_gt.shape[1]
        mask = (jnp.arange(l)[None, :] < lengths[:, None])
        map_mask = mask[:, None, :, None].astype(jnp.float32)
        diff = jnp.abs(hr_map.astype(jnp.float32)
                       - sr_out["map"].astype(jnp.float32)) * map_mask
        denom = jnp.maximum(jnp.sum(map_mask), 1.0) * hr_map.shape[1] \
            * hr_map.shape[3]
        attention_loss = jnp.sum(diff) / denom

        total = mse + attention_loss * self.stroke_lambda
        return total, {"mse": mse, "attention": attention_loss}
