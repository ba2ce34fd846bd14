from fudanocr_tpu.nn.layers import (
    TorchLayerNorm,
    PReLU,
    mish,
    ConvBNReLU,
    pixel_shuffle,
)
from fudanocr_tpu.nn.attention import (
    MultiHeadAttention,
    positional_encoding_1d,
    positional_encoding_2d,
    subsequent_mask,
)
from fudanocr_tpu.nn.recurrent import BiGRU, BiLSTM, SpatialGRU
from fudanocr_tpu.nn.tps import TPSSpatialTransformer
from fudanocr_tpu.nn.stn import STNHead
