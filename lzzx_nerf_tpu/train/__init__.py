"""Training: optimizer, loss stack, train/eval steps, host Trainer loop
(reference: nerf_triplane/TrainerUtil.py)."""

from .losses import head_losses, torso_losses, entropy_loss
from .optim import build_optimizer, param_label_fn
from .trainer import TrainState, Trainer, make_train_step, make_eval_step
from .metrics import PSNRMeter, psnr
