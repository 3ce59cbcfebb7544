"""cfm_tpu — a TPU-native conditional flow matching framework.

Flat exports mirror the reference's public API surface
(/root/reference/torchcfm/__init__.py:1-2) so a TorchCFM user finds the same
names: the five matchers, the OT coupling sampler, and the wasserstein metric.
"""

from . import (
    augment,
    config,
    data,
    eval,
    integrate,
    models,
    ops,
    parallel,
    schedules,
    spline,
    train,
    variants,
)
from .coupling import OTPlanSampler, wasserstein
from .integrate import FlowSolver, odeint, odeint_adjoint, sdeint
from .paths import (
    ConditionalFlowMatcher,
    ExactOptimalTransportConditionalFlowMatcher,
    SchrodingerBridgeConditionalFlowMatcher,
    TargetConditionalFlowMatcher,
    VariancePreservingConditionalFlowMatcher,
)
from .utils import pad_t_like_x
from .version import __version__

__all__ = [
    "ConditionalFlowMatcher",
    "ExactOptimalTransportConditionalFlowMatcher",
    "SchrodingerBridgeConditionalFlowMatcher",
    "TargetConditionalFlowMatcher",
    "VariancePreservingConditionalFlowMatcher",
    "OTPlanSampler",
    "wasserstein",
    "pad_t_like_x",
    "FlowSolver",
    "odeint",
    "odeint_adjoint",
    "sdeint",
    "augment",
    "config",
    "data",
    "eval",
    "integrate",
    "models",
    "ops",
    "parallel",
    "schedules",
    "spline",
    "train",
    "variants",
    "__version__",
]
