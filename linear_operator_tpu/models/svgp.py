"""Stochastic variational GP regression (SVGP, Hensman et al. 2013).

The uncollapsed inducing-point family — GPyTorch's main scalable-GP path
(gpytorch/variational/*, built on the reference operator stack).  Unlike SGPR
(models/sgpr.py), the variational distribution q(u) = N(m, S) is explicit, so
the ELBO decomposes over data points and supports MINIBATCHING — the model
of choice when n no longer fits a collapsed bound, and the natural data-
parallel consumer of the sharding layer (batch terms shard over the ``data``
mesh axis).

Whitened parameterization (q over eps with u = L_zz eps, the conditioning
trick GPyTorch defaults to): with A = L_zz^{-1} K_zx,

    q(f_i) = N(a_i^T m_w,  k_ii - a_i^T a_i + a_i^T S_w a_i)
    ELBO   = sum_i E_{q(f_i)}[log N(y_i | f_i, sigma^2)] - KL(q || N(0, I))

The KL is the closed-form whitened Gaussian KL; the expected log-likelihood
for the Gaussian likelihood is analytic.  Everything is jit/grad-safe;
inducing locations, hyperparameters, and variational parameters all train.

TPU notes: the per-step cost is one (m, m) Cholesky + (m, batch) triangular
solves + (batch, m) MXU contractions — dense, batched, static shapes.  The
variational covariance root is parameterized as an unconstrained lower
triangle with softplus diagonal, so S_w is PSD by construction and the KL
logdet is a diagonal sum (no factorization).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..operators.kernel import rbf_covar
from ..utils.cholesky import psd_safe_cholesky
from .gp import _softplus


class SVGPParams(NamedTuple):
    raw_lengthscale: jax.Array
    raw_outputscale: jax.Array
    raw_noise: jax.Array
    z: jax.Array  # (m, d) inducing locations
    var_mean: jax.Array  # (m,) whitened variational mean
    var_root_raw: jax.Array  # (m, m) unconstrained; lower tri -> root of S_w



def _var_root(raw: jax.Array) -> jax.Array:
    """Lower-triangular root with positive diagonal from an unconstrained
    square matrix (the standard bijector; keeps S_w PSD under gradient
    steps with no projection)."""
    tril = jnp.tril(raw, -1)
    diag = _softplus(jnp.diagonal(raw))
    return tril + jnp.diag(diag)


class SVGPRegression:
    """Minibatch variational GP regression (RBF kernel, swappable)."""

    def __init__(self, covar_func=rbf_covar, jitter: float = 1e-6):
        self.covar_func = covar_func
        self.jitter = jitter

    def init_params(self, x: jax.Array, num_inducing: int) -> SVGPParams:
        n, m = x.shape[0], num_inducing
        idx = jnp.linspace(0, n - 1, m).round().astype(jnp.int32)
        # identity S_w (= prior) at init: softplus^{-1}(1)
        raw_diag = jnp.log(jnp.expm1(jnp.asarray(1.0, dtype=x.dtype)))
        return SVGPParams(
            raw_lengthscale=jnp.zeros((), dtype=x.dtype),
            raw_outputscale=jnp.zeros((), dtype=x.dtype),
            raw_noise=jnp.asarray(-2.0, dtype=x.dtype),
            z=x[idx],
            var_mean=jnp.zeros((m,), dtype=x.dtype),
            var_root_raw=raw_diag * jnp.eye(m, dtype=x.dtype),
        )

    def _hyp(self, params: SVGPParams):
        return (
            _softplus(params.raw_lengthscale),
            _softplus(params.raw_outputscale),
            _softplus(params.raw_noise),
        )

    def _whitened(self, params: SVGPParams, x: jax.Array):
        """A = L_zz^{-1} K_zx (m, n) and the diagonal k_ii of K_xx."""
        ls, os_, _ = self._hyp(params)
        m = params.z.shape[0]
        k_zz = self.covar_func(
            params.z, params.z, lengthscale=ls, outputscale=os_
        ) + self.jitter * jnp.eye(m, dtype=x.dtype)
        l_zz = psd_safe_cholesky(k_zz)
        k_zx = self.covar_func(params.z, x, lengthscale=ls, outputscale=os_)
        a = jax.lax.linalg.triangular_solve(
            l_zz, k_zx, left_side=True, lower=True
        )  # (m, n)
        # pointwise k(x_i, x_i) via a batched 1x1 kernel eval (generic over
        # covar_func — no stationarity assumption)
        k_diag = self.covar_func(
            x[..., :, None, :], x[..., :, None, :], lengthscale=ls, outputscale=os_
        )[..., 0, 0]
        return a, k_diag

    def predictive(self, params: SVGPParams, x: jax.Array):
        """Marginal q(f) mean/variance at x — O(m^2 (m + batch))."""
        a, k_diag = self._whitened(params, x)
        r = _var_root(params.var_root_raw)  # (m, m)
        mean = a.T @ params.var_mean
        ra = r.T @ a  # (m, n)
        var = k_diag - jnp.sum(a * a, axis=0) + jnp.sum(ra * ra, axis=0)
        return mean, jnp.maximum(var, 1e-12)

    def kl(self, params: SVGPParams) -> jax.Array:
        """KL(N(m_w, R R^T) || N(0, I)) = 0.5 (||R||_F^2 + ||m_w||^2 - m
        - 2 sum log diag R)."""
        r = _var_root(params.var_root_raw)
        m = r.shape[-1]
        return 0.5 * (
            jnp.sum(r * r)
            + jnp.sum(params.var_mean**2)
            - m
            - 2.0 * jnp.sum(jnp.log(jnp.diagonal(r)))
        )

    def expected_log_lik(self, params: SVGPParams, x: jax.Array, y: jax.Array):
        """Per-point E_{q(f_i)}[log p(y_i | f_i)]; the Gaussian likelihood
        has the closed form -0.5 (log 2 pi sigma^2 + ((y-mu)^2 + var)/sigma^2).
        Non-conjugate subclasses override this (models/classification.py)."""
        noise = self._hyp(params)[2]
        mean, var = self.predictive(params, x)
        return -0.5 * (
            jnp.log(2.0 * jnp.pi * noise) + ((y - mean) ** 2 + var) / noise
        )

    def elbo(
        self,
        params: SVGPParams,
        x: jax.Array,
        y: jax.Array,
        *,
        num_data: int | None = None,
    ) -> jax.Array:
        """Evidence lower bound; ``num_data`` rescales a minibatch's data
        term to the full dataset (Hensman et al. 2013, eq. 4).  Shared
        template for every likelihood via ``expected_log_lik``."""
        batch = y.shape[-1]
        n = batch if num_data is None else num_data
        exp_ll = self.expected_log_lik(params, x, y)
        return (n / batch) * jnp.sum(exp_ll) - self.kl(params)

    def neg_elbo(self, params, x, y, *, num_data: int | None = None):
        return -self.elbo(params, x, y, num_data=num_data)

    def posterior(self, params: SVGPParams, x_star: jax.Array):
        """Predictive mean/variance of f at x_star (add noise for y)."""
        return self.predictive(params, x_star)

    def posterior_distribution(self, params: SVGPParams, x_star: jax.Array):
        """Joint q(f_*) as a lazy-covariance MultivariateNormal:
        K_ss - A^T A + (R^T A)^T (R^T A), kept as Sum + low-rank roots."""
        from ..distributions import MultivariateNormal
        from ..operators import (
            ConstantMulLinearOperator,
            RootLinearOperator,
        )

        ls, os_, _ = self._hyp(params)
        a, _ = self._whitened(params, x_star)
        r = _var_root(params.var_root_raw)
        mean = a.T @ params.var_mean
        k_ss = self.covar_func(x_star, x_star, lengthscale=ls, outputscale=os_)
        from ..operators import to_linear_operator

        cov = (
            to_linear_operator(k_ss)
            + ConstantMulLinearOperator(
                RootLinearOperator(a.T), jnp.asarray(-1.0, dtype=a.dtype)
            )
            + RootLinearOperator((r.T @ a).T)
        )
        return MultivariateNormal(mean, cov.add_jitter(self.jitter))


__all__ = ["SVGPParams", "SVGPRegression"]
