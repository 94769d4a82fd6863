"""Multitask GP regression (Bonilla et al. 2008): K = K_xx (x) K_tt + noise I.

The classic consumer of the Kronecker stack: the data kernel K_xx (RBF) and a
free-form low-rank task covariance K_tt = B B^T + diag(v) combine into an
(n*T x n*T) operator whose solves go through
``KroneckerProductAddedDiagLinearOperator``'s exact spectral-shift path
(constant noise) — factor eigendecompositions + Kronecker sweeps, never an
(nT)^2 matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..functions import inv_quad_logdet, solve
from ..operators import (
    DenseLinearOperator,
    KroneckerProductLinearOperator,
)
from .gp import _softplus
from ..operators.kernel import rbf_covar


class MultitaskGPParams(NamedTuple):
    raw_lengthscale: jax.Array
    raw_outputscale: jax.Array
    task_root: jax.Array  # (T, r) free-form low-rank task factor
    raw_task_diag: jax.Array  # (T,)
    raw_noise: jax.Array


class MultitaskGPRegression:
    """Exact multitask GP with an RBF data kernel and free-form task kernel.

    y has shape (n, T); the joint covariance over vec(y) (task index fastest)
    is K_xx (x) K_tt + sigma^2 I.
    """

    def __init__(self, num_tasks: int, task_rank: int = 2):
        self.num_tasks = num_tasks
        self.task_rank = task_rank

    def init_params(self, d: int, dtype=jnp.float32) -> MultitaskGPParams:
        T, r = self.num_tasks, self.task_rank
        return MultitaskGPParams(
            raw_lengthscale=jnp.zeros((), dtype=dtype),
            raw_outputscale=jnp.zeros((), dtype=dtype),
            task_root=jnp.eye(T, r, dtype=dtype),
            raw_task_diag=jnp.zeros((T,), dtype=dtype),
            raw_noise=jnp.asarray(-2.0, dtype=dtype),
        )

    def task_covar(self, params: MultitaskGPParams) -> jax.Array:
        B = params.task_root
        return B @ B.T + jnp.diag(_softplus(params.raw_task_diag))

    def data_covar(self, params: MultitaskGPParams, x1, x2=None) -> jax.Array:
        if x2 is None:
            x2 = x1
        return rbf_covar(
            x1,
            x2,
            lengthscale=_softplus(params.raw_lengthscale),
            outputscale=_softplus(params.raw_outputscale),
        )

    def train_operator(self, params: MultitaskGPParams, x):
        kxx = DenseLinearOperator(self.data_covar(params, x))
        ktt = DenseLinearOperator(self.task_covar(params))
        kron = KroneckerProductLinearOperator((kxx, ktt))
        return kron.add_diagonal(_softplus(params.raw_noise))

    def neg_mll(self, params: MultitaskGPParams, x, y, *, key=None) -> jax.Array:
        """x: (n, d); y: (n, T)."""
        n, T = y.shape
        K = self.train_operator(params, x)
        yv = y.reshape(n * T)[:, None]  # task index fastest, matches (x) layout
        iq, ld = inv_quad_logdet(K, yv, logdet=True, key=key)
        return 0.5 * (iq + ld + n * T * jnp.log(2.0 * jnp.pi)) / (n * T)

    def posterior_mean(self, params: MultitaskGPParams, x, y, x_star):
        n, T = y.shape
        m = x_star.shape[0]
        K = self.train_operator(params, x)
        alpha = solve(K, y.reshape(n * T)[:, None])  # (nT, 1)
        k_star = self._cross_covar(params, x_star, x)
        return (k_star @ alpha).reshape(m, T)

    def _cross_covar(self, params: MultitaskGPParams, x_star, x):
        """K(x_star, x) (x) K_tt as a lazy rectangular Kronecker operator."""
        return KroneckerProductLinearOperator(
            (
                DenseLinearOperator(self.data_covar(params, x_star, x)),
                DenseLinearOperator(self.task_covar(params)),
            )
        )

    def posterior(self, params: MultitaskGPParams, x, y, x_star, *, key=None):
        """Predictive mean and per-task latent variance at ``x_star`` via the
        shared LOVE helper (models/gp.py:love_posterior); the (mT, nT) cross
        block is applied lazily through the Kronecker sweep, never
        materialized."""
        from .gp import love_posterior

        n, T = y.shape
        m = x_star.shape[0]
        K = self.train_operator(params, x)
        k_star = self._cross_covar(params, x_star, x)
        # prior diagonal: the RBF data kernel is stationary, diag = outputscale
        data_diag = jnp.broadcast_to(_softplus(params.raw_outputscale), (m,))
        prior_diag = jnp.kron(data_diag, jnp.diagonal(self.task_covar(params)))
        mean, var = love_posterior(
            K, k_star, y.reshape(n * T), prior_diag, key=key
        )
        return mean.reshape(m, T), var.reshape(m, T)
