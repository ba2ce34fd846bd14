from fudanocr_tpu.models.sr.tbsrn import TBSRN
from fudanocr_tpu.models.sr.tsrn import TSRN
