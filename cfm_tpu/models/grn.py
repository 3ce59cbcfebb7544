"""Neural-graphical-model ODE functions for GRN / causal-structure learning.

TPU-native counterpart of the reference's mlpode.py family
(/root/reference/runner/src/models/components/mlpode.py:16-560 ``MLPODEF``/
``DeepEnsMLPODEF``, base.py ``LocallyConnected``): per-gene MLP vector
fields whose first-layer weight norms encode an adjacency (the learned
gene-regulatory graph), with group-lasso regularizers for structure
recovery. Ensembles are a vmapped parameter axis instead of module lists.

Shapes: x (n, d) -> v (n, d). The first layer is one dense (d, d*k) matmul
(MXU-shaped); the locally-connected hidden layers are per-gene einsums.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.flatten_util
import jax.numpy as jnp

Array = jax.Array


class LocallyConnected(nn.Module):
    """Per-variable linear layer: (n, d, m_in) -> (n, d, m_out), separate
    weights for every variable d (reference base.py ``LocallyConnected``)."""

    num_vars: int
    m_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        m_in = x.shape[-1]
        w = self.param(
            "weight", nn.initializers.lecun_normal(), (self.num_vars, m_in, self.m_out)
        )
        out = jnp.einsum("ndm,dmo->ndo", x, w)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.num_vars, self.m_out))
            out = out + b
        return out


class MLPODEF(nn.Module):
    """Per-gene MLP ODE function (mlpode.py:20-104).

    dims = [d, k, ..., 1]: d variables, k first-layer hidden units per gene,
    final output 1 per gene. ``fc1`` mixes all genes into each gene's hidden
    units — its weights, grouped per (input gene, output gene), ARE the
    learned adjacency; ``get_structure`` scores edges by group L2 norm.
    """

    dims: Sequence[int]
    time_invariant: bool = True
    gl_reg: float = 0.01

    @nn.compact
    def __call__(self, t: Array, x: Array) -> Array:
        d, k = self.dims[0], self.dims[1]
        assert self.dims[-1] == 1
        h = nn.Dense(d * k, name="fc1")(x)          # (n, d*k)
        h = h.reshape(-1, d, k)
        if not self.time_invariant:
            tb = jnp.broadcast_to(
                jnp.asarray(t, x.dtype).reshape(-1, 1, 1), (h.shape[0], d, 1)
            )
            h = jnp.concatenate([h, tb], axis=-1)
        for i in range(len(self.dims) - 2):
            m_out = self.dims[i + 2]
            h = LocallyConnected(d, m_out, name=f"fc2_{i}")(nn.elu(h))
        return h[..., 0]                             # (n, d)

    # -- structure / regularization (operate on a params pytree) -----------

    @staticmethod
    def _fc1_weight(params) -> Array:
        return params["params"]["fc1"]["kernel"]     # (d_in, d*k)

    def get_structure(self, params) -> Array:
        """(d, d) edge scores: L2 norm over each input-gene group
        (mlpode.py ``get_structure``). Entry [i, j] scores edge i -> j."""
        d, k = self.dims[0], self.dims[1]
        w = self._fc1_weight(params)                  # (d_in=i, d*k)
        w = w.reshape(d, d, k)                        # (i, j, k)
        return jnp.sqrt(jnp.sum(jnp.square(w), axis=-1))

    def l1_reg(self, params) -> Array:
        return jnp.sum(jnp.abs(self._fc1_weight(params)))

    def l2_reg(self, params) -> Array:
        reg = jnp.sum(jnp.square(self._fc1_weight(params)))
        p = params["params"]
        for name, sub in p.items():
            if name.startswith("fc2_"):
                reg = reg + jnp.sum(jnp.square(sub["weight"]))
        return reg

    def group_lasso_reg(self, params, gamma: float = 0.5) -> Array:
        """Adaptive group-lasso penalty on fc1 groups (mlpode.py
        ``group_weights`` + GL_reg usage)."""
        scores = self.get_structure(params)
        weights = jax.lax.stop_gradient(jnp.power(jnp.square(scores) + 1e-12, gamma))
        return self.gl_reg * jnp.sum(scores / jnp.maximum(weights, 1e-8))

    def grn_reg(self, params, grn: Array) -> Array:
        """Penalize weight mass on edges absent from a prior graph
        (mlpode.py ``grn_reg``); grn[i, j] = 1 for allowed edge i -> j."""
        d, k = self.dims[0], self.dims[1]
        w = self._fc1_weight(params).reshape(d, d, k)
        return jnp.sum(jnp.abs(w * (1.0 - grn[:, :, None])))


def make_ensemble(module: nn.Module, n_members: int):
    """Deep-ensemble as a vmapped parameter axis (DeepEnsMLPODEF analogue).

    Returns (init_fn(key, t, x) -> stacked params,
             apply_fn(stacked_params, t, x) -> (members, n, d)).
    """

    def init_fn(key, t, x):
        keys = jax.random.split(key, n_members)
        return jax.vmap(lambda k: module.init(k, t, x))(keys)

    def apply_fn(stacked_params, t, x):
        return jax.vmap(lambda p: module.apply(p, t, x))(stacked_params)

    return init_fn, apply_fn


class DeepSet(nn.Module):
    """Permutation-invariant set encoder (reference hyper_nets.py DeepSet):
    phi per element, sum-pool, rho. Encodes e.g. intervention-mask sets into
    a context vector for hypernetworks."""

    phi_dims: Sequence[int] = (64, 64)
    rho_dims: Sequence[int] = (64,)
    out_dim: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (n, set, d) -> (n, out)
        h = x
        for w in self.phi_dims:
            h = nn.relu(nn.Dense(w)(h))
        pooled = jnp.sum(h, axis=-2)
        for w in self.rho_dims:
            pooled = nn.relu(nn.Dense(w)(pooled))
        return nn.Dense(self.out_dim)(pooled)


class HyperLocallyConnected(nn.Module):
    """Locally-connected layer whose weights are generated from a context
    embedding (reference hyper_nets.py HyperLocallyConnected): enables
    intervention-conditioned dynamics without retraining."""

    num_vars: int
    m_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        # x: (n, d, m_in); context: (n, c) -> per-sample weights.
        m_in = x.shape[-1]
        d = self.num_vars
        w_flat = nn.Dense(d * m_in * self.m_out, name="hyper_w")(context)
        w = w_flat.reshape(-1, d, m_in, self.m_out)
        out = jnp.einsum("ndm,ndmo->ndo", x, w)
        if self.use_bias:
            b = nn.Dense(d * self.m_out, name="hyper_b")(context).reshape(-1, d, self.m_out)
            out = out + b
        return out


class HyperMLPODEF(nn.Module):
    """MLPODEF with the hidden locally-connected layer hyper-generated from a
    context (e.g. a DeepSet encoding of intervened variables) — the
    DeepEnsHyperMLPODEF role (mlpode.py/hyper_nets.py) as one module."""

    dims: Sequence[int]
    context_dim: int = 16

    @nn.compact
    def __call__(self, t: Array, x: Array, context: Array) -> Array:
        d, k = self.dims[0], self.dims[1]
        h = nn.Dense(d * k, name="fc1")(x).reshape(-1, d, k)
        h = nn.elu(h)
        h = HyperLocallyConnected(d, self.dims[-1], name="hyper_fc2")(h, context)
        return h[..., 0]


class BayesMLPODEF(nn.Module):
    """Bayesian-structure MLPODEF (BayesMLPODEF/DibsLayer role, simplified):
    learnable per-edge Bernoulli logits gate the fc1 weight groups; sampling
    with Gumbel-sigmoid gives a distribution over graphs, and
    ``edge_probs`` exposes the posterior for the Bayesian SHD metrics
    (cfm_tpu.eval.graphs.compare_graphs_bayesian_shd)."""

    dims: Sequence[int]
    temperature: float = 0.5

    @nn.compact
    def __call__(self, t: Array, x: Array, key: Optional[Array] = None) -> Array:
        d, k = self.dims[0], self.dims[1]
        logits = self.param("edge_logits", nn.initializers.zeros, (d, d))
        if key is not None:
            u = jax.random.uniform(key, (d, d), minval=1e-6, maxval=1 - 1e-6)
            g = jnp.log(u) - jnp.log1p(-u)
            gate = jax.nn.sigmoid((logits + g) / self.temperature)  # (d_in, d_out)
        else:
            gate = jax.nn.sigmoid(logits)
        w = self.param(
            "fc1_kernel", nn.initializers.lecun_normal(), (d, d * k)
        ).reshape(d, d, k)                            # (i, j, k)
        b = self.param("fc1_bias", nn.initializers.zeros, (d, k))
        wg = w * gate[:, :, None]                     # gate group (i -> j)
        h = jnp.einsum("ni,ijk->njk", x, wg) + b[None]
        for i in range(len(self.dims) - 2):
            h = LocallyConnected(d, self.dims[i + 2], name=f"fc2_{i}")(nn.elu(h))
        return h[..., 0]

    def edge_probs(self, params) -> Array:
        return jax.nn.sigmoid(params["params"]["edge_logits"])


class DibsMLPODEF(nn.Module):
    """DiBS-style variational graph posterior over the fc1 structure
    (reference base.py ``DibsLayer``:419-560; DiBS, Lorch & Rothfuss 2021).

    The fc1 weight matrix is low-rank factorized through latent node
    embeddings: W (r, d) "in" factors and V (r, d*k) "out" factors, each
    with a mean-field Gaussian posterior (softplus-std reparameterization —
    the reference's ``sample()``). The latent graph is read out of the
    factors themselves: Z[i, j] = mean over the k hidden units of
    (W^T V)[i, j*k:(j+1)*k], and edge probabilities are
    ``sigmoid(alpha * iter_num * Z)`` with the reference's linear alpha
    annealing (``get_graph``). ``h_acyclic`` is the polynomial NOTEARS
    penalty tr((I + G/d)^d) - d (``h_acyclic``).

    Per-particle parameters + ``make_ensemble`` give the particle posterior:
    each ensemble member is one particle; ``svgd_update`` transports the
    particle set with the SVGD kernelized gradient rule DiBS prescribes
    (the reference approximates this with independent VI particles).
    """

    dims: Sequence[int]
    rank: int = 16
    alpha: float = 0.1
    init_log_std: float = -3.0
    eps: float = 1e-8

    def _factors(self, params_col):
        return params_col["w_mean"], params_col["v_mean"]

    @nn.compact
    def __call__(self, t: Array, x: Array, key: Optional[Array] = None) -> Array:
        d, k = self.dims[0], self.dims[1]
        r = self.rank
        w_mean = self.param("w_mean", nn.initializers.lecun_normal(), (r, d))
        v_mean = self.param("v_mean", nn.initializers.lecun_normal(), (r, d * k))
        w_isp = self.param(
            "w_isp_std", nn.initializers.constant(self.init_log_std), (r, d)
        )
        v_isp = self.param(
            "v_isp_std", nn.initializers.constant(self.init_log_std), (r, d * k)
        )
        b = self.param("fc1_bias", nn.initializers.zeros, (d, k))
        if key is not None:
            kw, kv = jax.random.split(key)
            W = w_mean + jax.random.normal(kw, w_mean.shape) * (
                nn.softplus(w_isp) + self.eps
            )
            V = v_mean + jax.random.normal(kv, v_mean.shape) * (
                nn.softplus(v_isp) + self.eps
            )
        else:
            W, V = w_mean, v_mean
        weight = (W.T @ V).reshape(d, d, k)           # (i, j, k) edge groups
        h = jnp.einsum("ni,ijk->njk", x, weight) + b[None]
        for i in range(len(self.dims) - 2):
            h = LocallyConnected(d, self.dims[i + 2], name=f"fc2_{i}")(nn.elu(h))
        return h[..., 0]

    # --- graph readout (pure functions of the param pytree) ---------------

    def latent_z(self, params) -> Array:
        col = params["params"]
        d, k = self.dims[0], self.dims[1]
        W, V = col["w_mean"], col["v_mean"]
        return (W.T @ V).reshape(d, d, k).mean(-1)    # (i, j)

    def edge_probs(self, params, iter_num: float = 1.0) -> Array:
        return jax.nn.sigmoid(self.alpha * iter_num * self.latent_z(params))

    def h_acyclic(self, params, iter_num: float = 1.0) -> Array:
        """tr((I + G/d)^d) - d: zero iff the soft graph is acyclic."""
        d = self.dims[0]
        G = self.edge_probs(params, iter_num)
        M = jnp.eye(d) + G / d
        return jnp.trace(jnp.linalg.matrix_power(M, d)) - d

    def sample_structures(
        self, params, key: Array, n_structures: int, iter_num: float = 1.0
    ) -> Array:
        """n binary graphs ~ Bernoulli(edge_probs) for Bayesian SHD/AUC
        metrics (reference base.py ``get_structures``)."""
        p = self.edge_probs(params, iter_num)
        u = jax.random.uniform(key, (n_structures,) + p.shape)
        return (u < p[None]).astype(jnp.float32)

    def kl_to_prior(self, params, prior_log_sigma: float = 0.0) -> Array:
        """Mean-field Gaussian KL(q || N(0, sigma_p^2)) over both factors
        (reference BayesLinear._get_kl semantics)."""
        col = params["params"]
        total = 0.0
        for m, s in (("w_mean", "w_isp_std"), ("v_mean", "v_isp_std")):
            mu = col[m]
            sigma = nn.softplus(col[s]) + self.eps
            sp = jnp.exp(prior_log_sigma)
            total = total + jnp.sum(
                jnp.log(sp / sigma)
                + (sigma**2 + mu**2) / (2.0 * sp**2)
                - 0.5
            )
        return total


def svgd_update(particles, grads, bandwidth: Optional[float] = None):
    """One SVGD step direction for a particle posterior (DiBS sec. 5).

    particles/grads: pytrees whose leaves carry a leading particle axis P.
    Returns the transport direction phi with the same structure:
    phi_i = mean_j [ k(x_j, x_i) grad_j log p + grad_{x_j} k(x_j, x_i) ],
    with an RBF kernel on the flattened particle vectors and the median
    heuristic for the bandwidth when not given.
    """
    flat, unravel = jax.flatten_util.ravel_pytree(particles)
    P = jax.tree_util.tree_leaves(particles)[0].shape[0]
    X = flat.reshape(P, -1)
    G = jax.flatten_util.ravel_pytree(grads)[0].reshape(P, -1)
    sq = jnp.sum((X[:, None] - X[None]) ** 2, -1)      # (P, P)
    if bandwidth is None:
        med = jnp.median(sq)
        bandwidth = jnp.sqrt(0.5 * med / jnp.log(P + 1.0) + 1e-12)
    K = jnp.exp(-sq / (2.0 * bandwidth**2 + 1e-12))    # (P, P)
    # grad_{x_j} k(x_j, x_i) = k_ji * (x_i - x_j) / h^2
    attract = K @ G                                     # (P, D)
    repulse = (jnp.sum(K, 1, keepdims=True) * X - K @ X) / (bandwidth**2 + 1e-12)
    phi = (attract + repulse) / P
    return unravel(phi.reshape(-1))
