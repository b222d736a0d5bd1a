from .checkpoint import (create_exp_dir, load_checkpoint, save_checkpoint,
                         save_checkpoint_file, to_numpy_tree)
from .exp import setup_experiment
from .meters import AverageMeter
from .metrics import accuracy, cross_entropy, cross_entropy_label_smooth

__all__ = [
    "create_exp_dir", "load_checkpoint", "save_checkpoint",
    "save_checkpoint_file", "to_numpy_tree", "setup_experiment",
    "AverageMeter", "accuracy", "cross_entropy",
    "cross_entropy_label_smooth",
]
