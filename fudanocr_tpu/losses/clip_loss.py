"""CLIP symmetric contrastive loss with duplicate-aware targets.

Rebuild of image-ids-CTR/CCR-CLIP/main.py:98-106: ground truth for sample i
is the index of the FIRST batch element with the same label (font-rendered
char batches contain duplicates), then mean of image->text and text->image
cross-entropies.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def first_occurrence_targets(labels: Sequence[str]) -> np.ndarray:
    """host-side: gt[i] = first index j with labels[j] == labels[i]."""
    seen = {}
    out = np.zeros(len(labels), dtype=np.int32)
    for i, lab in enumerate(labels):
        if lab not in seen:
            seen[lab] = i
        out[i] = seen[lab]
    return out


def clip_symmetric_ce(image_features: jax.Array, text_features: jax.Array,
                      logit_scale: jax.Array,
                      targets: jax.Array) -> jax.Array:
    logits = logit_scale * image_features @ text_features.T  # (B, B)

    def ce(lg):
        logp = jax.nn.log_softmax(lg, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[:, None],
                                             axis=-1))

    return (ce(logits) + ce(logits.T)) / 2.0
