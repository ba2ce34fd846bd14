from fudanocr_tpu.train.state import TrainState
from fudanocr_tpu.train.sr import SRTrainer, make_sr_train_step, make_sr_eval_step
