"""Deep kernel learning: GP regression on learned neural features.

DKL (Wilson, Hu, Salakhutdinov & Xing, AISTATS 2016) composes a feature
extractor phi with a base kernel: k(x, x') = k_rbf(phi(x), phi(x')).  The
reference leaves this consumer to GPyTorch; here it doubles as the test of a
capability the operator engine must have: gradients of ``inv_quad_logdet``
must flow through the *data leaves* (x1/x2) of ``KernelLinearOperator`` —
the reference's `_bilinear_derivative` w.r.t. kernel inputs
(/root/reference/linear_operator/operators/kernel_linear_operator.py:138-230
treats hyperparameters and inputs alike as differentiable tensors).

TPU notes: the extractor is a plain matmul MLP (MXU-friendly), parameters
are explicit pytrees (no framework dependency), and the GP head reuses the
blocked/preconditioned ``ExactGPRegression`` machinery unchanged — the MLL
is one jit-compiled graph from raw inputs to scalar.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .gp import ExactGPRegression, GPParams, PosteriorCache


class MLPParams(NamedTuple):
    weights: Tuple[jax.Array, ...]
    biases: Tuple[jax.Array, ...]


class DKLParams(NamedTuple):
    mlp: MLPParams
    gp: GPParams


def init_mlp(key: jax.Array, sizes: Sequence[int], dtype=jnp.float32) -> MLPParams:
    """He-style init for a tanh MLP with layer ``sizes`` (in, ..., out)."""
    ws, bs = [], []
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / sizes[i]).astype(dtype)
        ws.append(scale * jax.random.normal(sub, (sizes[i], sizes[i + 1]), dtype))
        bs.append(jnp.zeros((sizes[i + 1],), dtype))
    return MLPParams(tuple(ws), tuple(bs))


def mlp_features(params: MLPParams, x: jax.Array) -> jax.Array:
    """phi(x): (n, d_in) -> (n, d_out); tanh hidden layers, linear output."""
    h = x
    n_layers = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        h = h @ w + b
        if i < n_layers - 1:
            h = jnp.tanh(h)
    return h


class DeepKernelGPRegression:
    """Exact-GP head on MLP features, trained end-to-end through the MLL.

    ``hidden``: MLP layer widths after the input dim (the last entry is the
    GP's feature dimension; keep it small — it is the kernel's ``d``).
    """

    def __init__(self, hidden: Sequence[int] = (64, 32, 4), **gp_kwargs):
        self.hidden = tuple(int(h) for h in hidden)
        self.gp = ExactGPRegression(**gp_kwargs)

    @property
    def feature_dim(self) -> int:
        return self.hidden[-1]

    def init_params(self, d_in: int, *, key=None, dtype=jnp.float32) -> DKLParams:
        if key is None:
            key = jax.random.PRNGKey(0)
        return DKLParams(
            mlp=init_mlp(key, (d_in, *self.hidden), dtype=dtype),
            gp=self.gp.init_params(self.feature_dim, dtype=dtype),
        )

    def features(self, params: DKLParams, x: jax.Array) -> jax.Array:
        return mlp_features(params.mlp, x)

    def train_operator(self, params: DKLParams, x):
        return self.gp.train_operator(params.gp, self.features(params, x))

    def neg_mll(self, params: DKLParams, x, y, *, key=None) -> jax.Array:
        """End-to-end MLL: grads reach the MLP weights through the kernel
        operator's data leaves (the DKL training signal)."""
        return self.gp.neg_mll(params.gp, self.features(params, x), y, key=key)

    def posterior(self, params: DKLParams, x, y, x_star, *, key=None):
        z, z_star = self.features(params, x), self.features(params, x_star)
        return self.gp.posterior(params.gp, z, y, z_star, key=key)

    def posterior_cache(self, params: DKLParams, x, y, *, key=None) -> PosteriorCache:
        return self.gp.posterior_cache(params.gp, self.features(params, x), y, key=key)

    def posterior_from_cache(self, params: DKLParams, x, cache: PosteriorCache, x_star):
        z, z_star = self.features(params, x), self.features(params, x_star)
        return self.gp.posterior_from_cache(params.gp, z, cache, z_star)
