from fudanocr_tpu.losses.sr_losses import (
    to_gray,
    weighted_cross_entropy,
    TextFocusLoss,
)
