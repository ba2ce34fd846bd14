"""CRNN — the frozen CTC recognizer used to score SR outputs.

Rebuild of scene-text-telescope/model/crnn/crnn.py:25-80: seven convs with
asymmetric pooling collapse a 32-high image to a 1-high, W/4-wide feature
sequence; two stacked BiLSTMs emit per-column class logits (blank + 36).

The reference runs this evaluator as `CRNN(32, 1, 37, 256)` on 1-channel
GRAY input produced by `parse_crnn_data` (bicubic 32x100 then
0.299R + 0.587G + 0.114B, interfaces/base.py:310,319-325) — use
`parse_crnn_input` below at every feed site for parity.

TPU notes: NHWC; the (2,2)/(2,1) pools with (0,1) width padding are
expressed as explicit pad + VALID pool; the BiLSTMs run as lax.scan with
hoisted input projections (see nn/recurrent.py). Output is (B, T, C)
batch-major (the reference emits (T, B, C) for warp-ctc).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from fudanocr_tpu.nn.recurrent import BiLSTM
from fudanocr_tpu.nn.layers import max_pool

Dtype = Any

# ITU-R BT.601 luma weights — the exact constants the reference uses to
# feed its 1-channel CRNN (interfaces/base.py:319-325 parse_crnn_data).
_LUMA = (0.299, 0.587, 0.114)


def parse_crnn_input(imgs: jax.Array, hw=(32, 100)) -> jax.Array:
    """Reference-faithful CRNN preprocessing: bicubic resize to 32x100,
    then RGB -> gray via 0.299R + 0.587G + 0.114B.

    Mirror of scene-text-telescope/interfaces/base.py:319-325
    (`parse_crnn_data`): the reference evaluator is `CRNN(32, 1, 37, 256)`
    (base.py:310) and every eval/test call feeds it this gray transform.
    Input (B, H, W, C>=3) NHWC in [0, 1]; output (B, 32, 100, 1).
    """
    from fudanocr_tpu.ops.resize import resize_bicubic_torch

    x = imgs[..., :3].astype(jnp.float32)
    # torch-exact bicubic (a=-0.75, no antialias) — jax.image.resize's
    # bicubic is a different kernel and would break evaluator parity
    x = resize_bicubic_torch(x, hw)
    r, g, b = _LUMA
    gray = r * x[..., 0:1] + g * x[..., 1:2] + b * x[..., 2:3]
    return gray


class CRNN(nn.Module):
    num_classes: int = 37
    hidden: int = 256
    in_channels: int = 1
    leaky_relu: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert x.shape[1] % 16 == 0, "input height must be a multiple of 16"
        act = (lambda v: nn.leaky_relu(v, 0.2)) if self.leaky_relu else nn.relu
        feats = (64, 128, 256, 256, 512, 512, 512)
        with_bn = (False, False, True, False, True, False, True)
        kernels = ((3, 3),) * 6 + ((2, 2),)
        pads = ("SAME",) * 6 + ("VALID",)

        for i in range(7):
            x = nn.Conv(feats[i], kernels[i], padding=pads[i],
                        dtype=self.dtype, name=f"conv{i}")(x)
            if with_bn[i]:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"bn{i}")(x)
            x = act(x)
            if i == 0 or i == 1:
                x = max_pool(x, 2)
            elif i == 3 or i == 5:
                # (2,2) window, (2,1) stride, width padded by 1 both sides
                x = max_pool(x, (2, 2), (2, 1), padding=[(0, 0), (1, 1)])

        b, h, w, c = x.shape
        assert h == 1, f"conv feature height must be 1, got {h}"
        seq = x.reshape(b, w, c)

        y = BiLSTM(self.hidden, dtype=self.dtype, name="rnn0")(seq)
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc0")(y)
        y = BiLSTM(self.hidden, dtype=self.dtype, name="rnn1")(y)
        y = nn.Dense(self.num_classes, dtype=self.dtype, name="fc1")(y)
        return y  # (B, T, num_classes)
