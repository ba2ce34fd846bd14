from fudanocr_tpu.core.registry import BACKBONES, HEADS, SEGMENTORS
from fudanocr_tpu.models.seg.cascade_mit import CascadeMiT
from fudanocr_tpu.models.seg.det_guided import CascadeMiTDetGuided
from fudanocr_tpu.models.seg.segformer_head import SegformerHead
from fudanocr_tpu.models.seg.encoder_decoder import (EncoderDecoder,
                                                     CascadeEncoderDecoder,
                                                     DetGuidedEncoderDecoder)

# the reference builds these through mmcv registries
# (@BACKBONES.register_module() etc.); same idea, our Registry
BACKBONES.register("CascadeMiT")(CascadeMiT)
BACKBONES.register("CascadeMiTDetGuided")(CascadeMiTDetGuided)
HEADS.register("SegformerHead")(SegformerHead)
SEGMENTORS.register("EncoderDecoder")(EncoderDecoder)
SEGMENTORS.register("CascadeEncoderDecoder")(CascadeEncoderDecoder)
SEGMENTORS.register("DetGuidedEncoderDecoder")(DetGuidedEncoderDecoder)
