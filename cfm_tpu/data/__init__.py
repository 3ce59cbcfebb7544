"""Data: 2-D toy generators, image pipelines, trajectory datasets."""

from .toy import (
    blobs,
    eight_gaussians,
    gaussian_mixture,
    moons,
    pinwheel,
    sample_8gaussians,
    sample_moons,
    checkerboard,
    circles,
    spirals,
    swissroll,
    scurve,
    two_dim_data,
)

__all__ = [
    "blobs",
    "eight_gaussians",
    "gaussian_mixture",
    "moons",
    "pinwheel",
    "sample_8gaussians",
    "sample_moons",
    "checkerboard",
    "circles",
    "spirals",
    "swissroll",
    "scurve",
    "two_dim_data",
]
