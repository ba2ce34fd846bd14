from fudanocr_tpu.data.collate import resize_normalize, sr_collate
from fudanocr_tpu.data.synthetic import SyntheticTextZoom
