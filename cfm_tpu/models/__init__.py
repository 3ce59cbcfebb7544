"""Model zoo: tutorial MLPs, ICNN, and the guided-diffusion UNet.

TPU-native counterparts of /root/reference/torchcfm/models/ and
/root/reference/runner/src/models/components/ nets, written in flax.linen so
parameters are explicit pytrees that shard under pjit.
"""

from .mlp import (
    MLP,
    GradModel,
    ICNN,
    SimpleDenseNet,
    TimeInvariantVelocityNet,
    VelocityNet,
)
from .unet import (
    AttentionPool2d,
    EncoderUNetModel,
    SuperResModel,
    UNetModel,
    UNetModelWrapper,
)

__all__ = [
    "MLP",
    "GradModel",
    "ICNN",
    "SimpleDenseNet",
    "TimeInvariantVelocityNet",
    "VelocityNet",
    "AttentionPool2d",
    "EncoderUNetModel",
    "SuperResModel",
    "UNetModel",
    "UNetModelWrapper",
]
