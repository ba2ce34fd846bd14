from fudanocr_tpu.models.seg.cascade_mit import CascadeMiT
from fudanocr_tpu.models.seg.det_guided import CascadeMiTDetGuided
from fudanocr_tpu.models.seg.segformer_head import SegformerHead
from fudanocr_tpu.models.seg.encoder_decoder import (EncoderDecoder,
                                                     DetGuidedEncoderDecoder)
