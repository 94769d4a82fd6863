"""Variational GP classification (SVGP + Bernoulli likelihood).

The non-conjugate counterpart of models/svgp.py — GPyTorch's
``VariationalGP`` + ``BernoulliLikelihood`` path, the standard scalable GP
classifier built on the reference operator stack.  The whitened variational
machinery (inducing points, q(u), KL) is shared with ``SVGPRegression``;
only the data term changes: the expected log-likelihood
E_{q(f_i)}[log p(y_i | f_i)] has no closed form, so it is computed by

- **probit** (default): log Phi(y f).  The 1-D Gaussian expectation is
  evaluated by Gauss-Hermite quadrature; the PREDICTIVE class probability
  is exact and analytic, p(y=1 | x) = Phi(mu / sqrt(1 + var)).
- **logit**: log sigmoid(y f) via the same quadrature; predictive
  probabilities also by quadrature.

TPU notes: the quadrature adds one (batch, Q) broadcast + reduction per
step — pure VPU work fused by XLA into the ELBO graph; Q is static so the
whole step stays one compiled program.  Nodes/weights are compile-time
constants (numpy, not traced).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..operators.kernel import rbf_covar
from .svgp import SVGPParams, SVGPRegression


def gauss_hermite_expectation(fn, mean, var, num_points: int = 20):
    """E_{f ~ N(mean, var)}[fn(f)] by Gauss-Hermite quadrature, batched over
    the leading dims of ``mean``/``var``.

    With the substitution f = mean + sqrt(2 var) t the Hermite rule gives
    sum_q w_q fn(f_q) / sqrt(pi).  Nodes/weights are numpy compile-time
    constants (static Q keeps the graph shape-stable under jit).
    """
    nodes, weights = np.polynomial.hermite.hermgauss(num_points)
    nodes = jnp.asarray(nodes, dtype=mean.dtype)
    weights = jnp.asarray(weights / np.sqrt(np.pi), dtype=mean.dtype)
    f = mean[..., None] + jnp.sqrt(2.0 * var)[..., None] * nodes
    return jnp.sum(fn(f) * weights, axis=-1)


def _log_probit(z):
    """log Phi(z), numerically stable via the scipy-parity logcdf."""
    return jax.scipy.stats.norm.logcdf(z)


def _log_sigmoid(z):
    return -jax.nn.softplus(-z)


class SVGPClassification(SVGPRegression):
    """Binary GP classification with inducing points (minibatch ELBO).

    Labels ``y`` are {0, 1} (mapped internally to +-1, both link
    log-likelihoods being symmetric: log p(y|f) = log g(sign(y) f)).
    ``raw_noise`` in the shared ``SVGPParams`` is unused here.
    """

    def __init__(
        self,
        covar_func=rbf_covar,
        jitter: float = 1e-6,
        likelihood: str = "probit",
        num_quadrature_points: int = 20,
    ):
        super().__init__(covar_func=covar_func, jitter=jitter)
        if likelihood not in ("probit", "logit"):
            raise ValueError("likelihood must be 'probit' or 'logit'")
        self.likelihood = likelihood
        self.num_quadrature_points = num_quadrature_points

    def _log_lik(self, z):
        return _log_probit(z) if self.likelihood == "probit" else _log_sigmoid(z)

    def expected_log_lik(self, params: SVGPParams, x: jax.Array, y: jax.Array):
        """Per-point E_{q(f_i)}[log p(y_i | f_i)], shape (batch,)."""
        mean, var = self.predictive(params, x)
        sign = 2.0 * y.astype(mean.dtype) - 1.0
        return gauss_hermite_expectation(
            lambda f: self._log_lik(sign[..., None] * f),
            mean,
            var,
            self.num_quadrature_points,
        )

    # elbo() is inherited: the SVGPRegression template over expected_log_lik

    def predict_proba(self, params: SVGPParams, x_star: jax.Array):
        """p(y = 1 | x_star) marginally per point.

        Probit: exact Phi(mu / sqrt(1 + var)) (Gaussian-probit integral
        identity).  Logit: Gauss-Hermite quadrature of sigmoid."""
        mean, var = self.predictive(params, x_star)
        if self.likelihood == "probit":
            return jax.scipy.stats.norm.cdf(mean / jnp.sqrt(1.0 + var))
        return gauss_hermite_expectation(
            jax.nn.sigmoid, mean, var, self.num_quadrature_points
        )

    def predict(self, params: SVGPParams, x_star: jax.Array):
        """Hard labels in {0, 1}."""
        return (self.predict_proba(params, x_star) >= 0.5).astype(jnp.int32)


class SVGPPoissonRegression(SVGPRegression):
    """Poisson count regression with a log link (non-conjugate SVGP).

    rate = exp(f); the expected log-likelihood is CLOSED FORM under a
    Gaussian q(f): E[y f - exp(f) - log y!] = y mu - exp(mu + var/2)
    - lgamma(y+1), so no quadrature is needed (the GPyTorch analog
    evaluates the same moment-generating-function identity).
    """

    def expected_log_lik(self, params: SVGPParams, x: jax.Array, y: jax.Array):
        mean, var = self.predictive(params, x)
        y = y.astype(mean.dtype)
        return y * mean - jnp.exp(mean + 0.5 * var) - jax.lax.lgamma(y + 1.0)

    def predict_rate(self, params: SVGPParams, x_star: jax.Array):
        """Posterior-expected rate E[exp(f)] = exp(mu + var/2) per point."""
        mean, var = self.predictive(params, x_star)
        return jnp.exp(mean + 0.5 * var)


__all__ = [
    "SVGPClassification",
    "SVGPPoissonRegression",
    "gauss_hermite_expectation",
]
