"""Segmentation inference API (mmseg/apis/inference.py equivalent):
`init_segmentor(cfg_path, ckpt)` -> (model, variables);
`inference_segmentor(...)` -> per-pixel class map; `show_result` blends a
palette over the image.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PALETTE = ((0, 0, 0), (220, 40, 40), (40, 220, 40), (40, 40, 220))


def init_segmentor(config_path: str, checkpoint: Optional[str] = None,
                   overrides: Sequence[str] = ()):
    from fudanocr_tpu.core import checkpoint as ckpt_lib
    from fudanocr_tpu.core.config import load_config, merge_cli_overrides
    from fudanocr_tpu.apps.seg.train import build_model

    cfg = merge_cli_overrides(load_config(config_path), list(overrides))
    model = build_model(cfg)
    size = tuple(cfg.data.get("synthetic_size", [64, 64]))
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, *size, 3)), train=False)
    variables = ckpt_lib.load(checkpoint, template) if checkpoint \
        else template
    return model, variables, cfg


def inference_segmentor(model, variables, image: np.ndarray,
                        crop: Optional[Tuple[int, int]] = None,
                        stride: Optional[Tuple[int, int]] = None
                        ) -> np.ndarray:
    """image (H, W, 3) float/uint8 -> (H, W) int class map."""
    from fudanocr_tpu.data.seg_pipeline import Normalize
    from fudanocr_tpu.models.seg.encoder_decoder import slide_inference

    img = Normalize()({"img": np.asarray(image)})["img"][None]

    def fwd(x):
        out = model.apply(variables, x)
        return out[0] if isinstance(out, tuple) else out

    if crop is not None:
        logits = slide_inference(jax.jit(fwd), jnp.asarray(img), crop,
                                 stride or crop)
    else:
        logits = jax.jit(fwd)(jnp.asarray(img))
    return np.asarray(jnp.argmax(logits, -1))[0]


def show_result(image: np.ndarray, seg: np.ndarray,
                palette=DEFAULT_PALETTE, opacity: float = 0.5) -> np.ndarray:
    """Blend the class palette over the image (base.py:112-146 style)."""
    img = np.asarray(image, np.float32)
    color = np.zeros_like(img)
    for cls, rgb in enumerate(palette):
        color[seg == cls] = rgb
    out = img * (1 - opacity) + color * opacity
    return np.clip(out, 0, 255).astype(np.uint8)
