"""Graph-inference metrics: Bayesian SHD and AUC over inferred GRN adjacency.

Counterpart of /root/reference/runner/src/models/components/evaluation.py:
7-255 — metrics for gene-regulatory-network (causal graph) inference from the
neural-graphical-model experiments. Encoding convention follows the
reference: rows of ``true_graph`` with a negative first entry are
"deidentifiable" duplicate variables whose outgoing edges fold onto the row
``-(value + 1)`` before comparison.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _fold_deidentified(true_graph: np.ndarray, estimated_graph: np.ndarray):
    true_graph = np.asarray(true_graph).squeeze().astype(int)
    estimated_graph = np.asarray(estimated_graph).squeeze().astype(float)
    var_maps = np.minimum(0, true_graph)[:, 0]
    var_mask = var_maps < 0
    vars_to_deidentify = -(var_maps[var_mask] + 1)
    folded = estimated_graph[~var_mask].copy()
    for i, v in enumerate(vars_to_deidentify):
        folded[v] += estimated_graph[var_mask][i]
    return true_graph[~var_mask], folded


def structural_hamming_distance(true_graph: np.ndarray, estimated_graph: np.ndarray) -> float:
    """SHD with deidentified-variable folding (evaluation.py:7-30)."""
    t, e = _fold_deidentified(true_graph, estimated_graph)
    return float(np.sum(np.abs(t - e)))


def compare_graphs_bayesian_shd(
    true_graph: np.ndarray, estimated_graphs: Sequence[np.ndarray]
) -> Tuple[float, float]:
    """(mean SHD, mean thresholded SHD) over a posterior sample of graphs
    (evaluation.py:32-42)."""
    shd = float(np.mean([structural_hamming_distance(true_graph, g) for g in estimated_graphs]))
    tshd = float(
        np.mean(
            [
                structural_hamming_distance(true_graph, (np.asarray(g) > 0.5).astype(float))
                for g in estimated_graphs
            ]
        )
    )
    return shd, tshd


def compare_graphs(true_graph: np.ndarray, estimated_graph: np.ndarray) -> dict:
    """Edge-level AP / ROC-AUC + SHD for one estimated adjacency
    (evaluation.py ``compare_graphs``)."""
    from sklearn.metrics import average_precision_score, roc_auc_score

    t, e = _fold_deidentified(true_graph, estimated_graph)
    y_true = (t.flatten() > 0).astype(int)
    y_score = e.flatten()
    out = {"shd": float(np.sum(np.abs(t - (e > 0.5).astype(float))))}
    if 0 < y_true.sum() < len(y_true):
        out["ap"] = float(average_precision_score(y_true, y_score))
        out["auroc"] = float(roc_auc_score(y_true, y_score))
    return out
