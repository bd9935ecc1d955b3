from dpvo_tpu.train.loss import clip_loss, flow_error, pose_error  # noqa: F401
from dpvo_tpu.train.step import make_optimizer, make_train_step, make_val_step  # noqa: F401
