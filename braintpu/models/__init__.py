"""Model family: functional 3D U-Nets (nnU-Net KAIST topology) + plans ingestion."""

from .plans import PreprocessPlan, config_from_plans, load_nnunet_plans
from .unet3d import (
    MODEL1_BN,
    MODEL2_GN_LARGE,
    UNetConfig,
    apply_unet,
    bottleneck_features,
    decoder_channels,
    encoder_features,
    estimate_activation_bytes,
    fold_batchnorm,
    init_params,
    param_count,
)

__all__ = [
    "MODEL1_BN",
    "MODEL2_GN_LARGE",
    "UNetConfig",
    "apply_unet",
    "bottleneck_features",
    "decoder_channels",
    "encoder_features",
    "estimate_activation_bytes",
    "fold_batchnorm",
    "init_params",
    "param_count",
    "PreprocessPlan",
    "config_from_plans",
    "load_nnunet_plans",
]
