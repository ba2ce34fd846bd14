from fudanocr_tpu.eval.metrics import psnr, ssim, str_filt
from fudanocr_tpu.eval.ctc import CTCLabelConverter, ctc_greedy_decode
