from fudanocr_tpu.models.sr.tbsrn import TBSRN
from fudanocr_tpu.models.sr.tsrn import TSRN
from fudanocr_tpu.models.sr.baselines import (
    SRCNN, SRResNet, EDSR, RDN, RRDBNet, SRDiscriminator, build_baseline)
