from fudanocr_tpu.models.rec.crnn import CRNN
from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer, OCRResNet
