from splatjax.train.loss import combined_loss, l1, psnr, ssim
from splatjax.train.fit import (
    FitConfig,
    fit,
    init_random,
    make_dp_train_step,
    make_train_step,
)
from splatjax.train.densify import DensifyConfig, densify_and_prune
from splatjax.train.checkpoint import (
    CheckpointManager,
    export_ply,
    export_splat,
)

__all__ = [
    "DensifyConfig",
    "densify_and_prune",
    "combined_loss",
    "l1",
    "psnr",
    "ssim",
    "FitConfig",
    "fit",
    "init_random",
    "make_train_step",
    "make_dp_train_step",
    "CheckpointManager",
    "export_ply",
    "export_splat",
]
