"""Train state: params + batch_stats + optimizer, one struct for all apps."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(self.batch_stats if new_batch_stats is None
                         else new_batch_stats),
            opt_state=new_opt_state,
        )


def adam_with_clip(lr: float, beta1: float = 0.5, beta2: float = 0.999,
                   clip: Optional[float] = 0.25) -> optax.GradientTransformation:
    """The SR recipe: Adam(lr, β1=0.5) + global-norm clip 0.25
    (interfaces/base.py:194-199, super_resolution.py:79-84)."""
    parts = []
    if clip is not None:
        parts.append(optax.clip_by_global_norm(clip))
    parts.append(optax.adam(lr, b1=beta1, b2=beta2))
    return optax.chain(*parts)
