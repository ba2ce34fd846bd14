"""fudanocr_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of FudanOCR's capabilities.

One coherent framework spanning the reference's three pillars:

* text-image super-resolution (Scene Text Telescope's TBSRN, Text Gestalt's
  stroke-aware TSRN, plus the SRCNN/SRResNet/EDSR/RDN baselines),
* Chinese text/character recognition (stroke-level decomposition, CCR-CLIP
  image-IDS alignment, orientation-independent CTR, character-profile
  matching — all sharing one ResNet+transformer-decoder core), and
* scene text segmentation (mini-mmseg: cascade MixVisionTransformer backbone,
  SegFormer head, sliding-window inference).

Design stance (vs. the PyTorch reference at FudanVI/FudanOCR):
  - NHWC layouts, bf16 compute / fp32 params, static shapes, masked losses.
  - `lax.scan` recurrences with MXU-batched input projections instead of
    cuDNN GRU/LSTM.
  - One `jax.sharding.Mesh` with axes ('data', 'model'); XLA emits the
    ICI collectives the reference got from NCCL/DataParallel.
  - Pallas kernels for the hot fused ops.
"""

__version__ = "0.1.0"
