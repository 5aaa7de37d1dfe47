from .losses import cal_loss, smooth_cross_entropy, cross_entropy
from .trainer import TrainState, make_train_step, make_eval_step, fit
from .adversarial import bim_rotation_attack, bim_translation_attack

__all__ = [
    "cal_loss", "smooth_cross_entropy", "cross_entropy",
    "TrainState", "make_train_step", "make_eval_step", "fit",
    "bim_rotation_attack", "bim_translation_attack",
]
