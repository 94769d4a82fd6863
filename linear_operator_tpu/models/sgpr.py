"""Sparse GP regression with inducing points (SGPR, Titsias 2009).

The inducing-point model family the reference leaves to GPyTorch — here it
exercises the Woodbury operator stack end-to-end: the collapsed-ELBO
Gaussian term is exactly a ``LowRankRootAddedDiagLinearOperator``
(Q_nn + sigma^2 I with Q_nn = U U^T, U = K_nm L_mm^{-T}), so the marginal
term costs O(n m^2) via the cap-matrix solve + determinant lemma
(operators/low_rank_root_added_diag.py — the README 10M x 10M machinery)
instead of any n x n factorization.

    ELBO = log N(y | 0, Q_nn + sigma^2 I)
           - 1/(2 sigma^2) * (tr K_nn - tr Q_nn)

Everything is jit/grad-safe; inducing locations are free parameters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..functions import inv_quad_logdet
from ..operators.dense import DenseLinearOperator
from ..operators.root import LowRankRootLinearOperator
from ..operators.kernel import rbf_covar
from ..utils.cholesky import psd_safe_cholesky
from .gp import _softplus


class SGPRParams(NamedTuple):
    raw_lengthscale: jax.Array
    raw_outputscale: jax.Array
    raw_noise: jax.Array
    z: jax.Array  # (m, d) inducing locations



class SGPRRegression:
    """Collapsed-bound sparse GP regression (RBF kernel, swappable)."""

    def __init__(self, covar_func=rbf_covar, jitter: float = 1e-6):
        self.covar_func = covar_func
        self.jitter = jitter

    def init_params(self, x: jax.Array, num_inducing: int) -> SGPRParams:
        n = x.shape[0]
        idx = jnp.linspace(0, n - 1, num_inducing).round().astype(jnp.int32)
        return SGPRParams(
            raw_lengthscale=jnp.zeros((), dtype=x.dtype),
            raw_outputscale=jnp.zeros((), dtype=x.dtype),
            raw_noise=jnp.asarray(-2.0, dtype=x.dtype),
            z=x[idx],
        )

    def _hyp(self, params: SGPRParams):
        return (
            _softplus(params.raw_lengthscale),
            _softplus(params.raw_outputscale),
            _softplus(params.raw_noise),
        )

    def _whitened_root(self, params: SGPRParams, x: jax.Array) -> jax.Array:
        """U = K_nm L_mm^{-T} with K_mm = L_mm L_mm^T, so U U^T = Q_nn."""
        ls, os_, _ = self._hyp(params)
        m = params.z.shape[0]
        k_nm = self.covar_func(x, params.z, lengthscale=ls, outputscale=os_)
        k_mm = self.covar_func(
            params.z, params.z, lengthscale=ls, outputscale=os_
        ) + self.jitter * os_ * jnp.eye(m, dtype=x.dtype)
        l_mm = psd_safe_cholesky(k_mm)
        # U^T = L_mm^{-1} K_mn
        ut = jax.lax.linalg.triangular_solve(
            l_mm, jnp.swapaxes(k_nm, -1, -2), left_side=True, lower=True
        )
        return jnp.swapaxes(ut, -1, -2)  # (n, m)

    def _kernel_diag(self, params: SGPRParams, x: jax.Array) -> jax.Array:
        """Pointwise k(x_i, x_i) via a batched 1x1 kernel eval (generic over
        ``covar_func``; the SVGP model uses the same pattern)."""
        ls, os_, _ = self._hyp(params)
        return self.covar_func(
            x[..., :, None, :], x[..., :, None, :], lengthscale=ls, outputscale=os_
        )[..., 0, 0]

    def train_operator(self, params: SGPRParams, x: jax.Array):
        """Q_nn + sigma^2 I as a LowRankRootAddedDiag (exact Woodbury)."""
        _, _, noise = self._hyp(params)
        u = self._whitened_root(params, x)
        return LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(
            jnp.broadcast_to(noise, (x.shape[0],))
        )

    def elbo(self, params: SGPRParams, x: jax.Array, y: jax.Array) -> jax.Array:
        """Collapsed lower bound on log p(y) (Titsias 2009, eq. 9)."""
        _, _, noise = self._hyp(params)
        n = y.shape[-1]
        u = self._whitened_root(params, x)
        op = LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(
            jnp.broadcast_to(noise, (n,))
        )
        iq, ld = inv_quad_logdet(op, y[..., None], logdet=True)
        gaussian = -0.5 * (jnp.sum(iq) + ld + n * jnp.log(2.0 * jnp.pi))
        # trace correction: tr(K_nn) - tr(Q_nn).  tr(K_nn) via a batched 1x1
        # kernel eval (generic over covar_func — no stationarity assumption)
        tr_k = jnp.sum(self._kernel_diag(params, x))
        tr_q = jnp.sum(u * u)
        return gaussian - 0.5 * (tr_k - tr_q) / noise

    def neg_elbo(self, params: SGPRParams, x, y) -> jax.Array:
        return -self.elbo(params, x, y) / y.shape[-1]

    def posterior(self, params: SGPRParams, x, y, x_star):
        """Predictive mean/variance at x_star (Titsias 2009, eq. 6).

        mean = k_*m Sigma K_mn y / sigma^2,
        var  = k_** - k_*m K_mm^{-1} k_m* + k_*m Sigma k_m*,
        Sigma = (K_mm + K_mn K_nm / sigma^2)^{-1}; computed in the whitened
        basis (L_mm^{-1}-transformed) for stability.
        """
        ls, os_, noise = self._hyp(params)
        m = params.z.shape[0]
        u = self._whitened_root(params, x)  # (n, m) whitened K_nm
        # whitened Sigma^{-1} = I + U^T U / sigma^2
        a = jnp.eye(m, dtype=x.dtype) + (
            jnp.matmul(
                jnp.swapaxes(u, -1, -2), u, precision=jax.lax.Precision.HIGHEST
            )
            / noise
        )
        l_a = psd_safe_cholesky(a)
        uy = jnp.matmul(
            jnp.swapaxes(u, -1, -2), y[..., None], precision=jax.lax.Precision.HIGHEST
        )  # (m, 1)
        w = jax.lax.linalg.triangular_solve(l_a, uy, left_side=True, lower=True)
        w = jax.lax.linalg.triangular_solve(
            l_a, w, left_side=True, lower=True, transpose_a=True
        )  # A^{-1} U^T y

        k_sm = self.covar_func(x_star, params.z, lengthscale=ls, outputscale=os_)
        k_mm = self.covar_func(
            params.z, params.z, lengthscale=ls, outputscale=os_
        ) + self.jitter * os_ * jnp.eye(m, dtype=x.dtype)
        l_mm = psd_safe_cholesky(k_mm)
        u_star_t = jax.lax.linalg.triangular_solve(
            l_mm, jnp.swapaxes(k_sm, -1, -2), left_side=True, lower=True
        )  # (m, n_*) whitened k_m*
        mean = (jnp.swapaxes(u_star_t, -1, -2) @ w)[..., 0] / noise

        # var = k_** - ||u_*||^2 + ||L_A^{-1} u_*||^2
        v = jax.lax.linalg.triangular_solve(
            l_a, u_star_t, left_side=True, lower=True
        )
        k_ss = self._kernel_diag(params, x_star)
        var = k_ss - jnp.sum(u_star_t * u_star_t, axis=-2) + jnp.sum(v * v, axis=-2)
        return mean, jnp.maximum(var, 0.0)
