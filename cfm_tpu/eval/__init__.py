"""Evaluation: distribution distances, FID statistics, sample quality."""

from .metrics import (
    compute_distances,
    compute_distribution_distances,
    linear_mmd2,
    mix_rbf_mmd2,
    poly_mmd2,
)

__all__ = [
    "compute_distances",
    "compute_distribution_distances",
    "linear_mmd2",
    "mix_rbf_mmd2",
    "poly_mmd2",
]
