"""On-device numerical kernels: cost matrices, OT solvers, ODE/SDE integrators."""

from .assignment import auction_assignment, hungarian_assignment, solve_assignment
from .cost import euclidean_cost, sq_euclidean_cost
from .sinkhorn import partial_wasserstein, sinkhorn, sinkhorn2, sinkhorn_unbalanced

__all__ = [
    "auction_assignment",
    "hungarian_assignment",
    "solve_assignment",
    "sq_euclidean_cost",
    "euclidean_cost",
    "sinkhorn",
    "sinkhorn2",
    "sinkhorn_unbalanced",
    "partial_wasserstein",
]
