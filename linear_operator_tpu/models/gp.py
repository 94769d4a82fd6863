"""Exact GP regression on top of the operator engine.

The marginal log-likelihood is the reference's flagship call stack
(SURVEY.md section 3.2): K = k(X,X) + noise*I as a lazy
KernelLinearOperator + AddedDiag, and

    -2 log p(y) = y^T K^{-1} y + log|K| + n log 2 pi

computed by ``inv_quad_logdet`` — Cholesky below the size cutoff,
preconditioned CG + SLQ above it, with gradients through the custom VJPs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..operators.kernel import KernelLinearOperator, rbf_covar
from ..functions import inv_quad_logdet, solve


class GPParams(NamedTuple):
    raw_lengthscale: jax.Array  # softplus-parameterized
    raw_outputscale: jax.Array
    raw_noise: jax.Array


class PosteriorCache(NamedTuple):
    """Training-time prediction caches (see ``posterior_cache``)."""

    alpha: jax.Array  # (*b, n, 1)   K^{-1} y
    root_inv: jax.Array  # (*b, n, k)  R with R R^T ≈ K^{-1}


def _softplus(x):
    return jax.nn.softplus(x) + 1e-6


def love_posterior(K, k_star, y, k_ss_diag, *, key=None):
    """Predictive mean/variance from a train operator ``K``, a (lazy)
    cross-covariance ``k_star``, targets ``y`` and the prior diagonal at the
    query points — the LOVE pattern (Pleiss et al. 2018) shared by the SKI
    and multitask model families: var = k_ss_diag - row_norms(k_star R)^2
    with R an inverse root of K.  ``k_star`` is applied lazily (never an
    (m, n) dense block for structured operators)."""
    alpha = solve(K, y[..., None])
    mean = (k_star @ alpha)[..., 0]
    r_inv = K.root_inv_decomposition(key=key).root.to_dense()  # (n, k)
    v = k_star @ r_inv  # (m, k)
    var = k_ss_diag - jnp.sum(v * v, axis=-1)
    return mean, jnp.maximum(var, 0.0)


class ExactGPRegression:
    """Functional exact-GP model with an RBF kernel (swappable covar_func).

    ``use_pallas`` routes kernel mat-vecs through the fused Pallas tile
    kernel (ops/rbf.py) instead of the blocked XLA path.
    """

    def __init__(
        self,
        covar_func=rbf_covar,
        block_rows: int = 4096,
        use_pallas: bool = False,
        materialize_threshold: int | None = 2**30,
    ):
        self.covar_func = covar_func
        self.block_rows = block_rows
        self.use_pallas = use_pallas and covar_func is rbf_covar
        self.materialize_threshold = materialize_threshold

    def init_params(self, d: int, dtype=jnp.float32) -> GPParams:
        return GPParams(
            raw_lengthscale=jnp.zeros((), dtype=dtype),
            raw_outputscale=jnp.zeros((), dtype=dtype),
            raw_noise=jnp.asarray(-2.0, dtype=dtype),
        )

    def covariance(self, params: GPParams, x1, x2=None, symmetric=None):
        if symmetric is None:
            symmetric = x2 is None
        if x2 is None:
            x2 = x1
        from ..operators.kernel import rbf_pallas_matvec

        return KernelLinearOperator(
            x1,
            x2,
            {
                "lengthscale": _softplus(params.raw_lengthscale),
                "outputscale": _softplus(params.raw_outputscale),
            },
            covar_func=self.covar_func,
            block_rows=self.block_rows,
            symmetric=symmetric,
            matvec_impl=rbf_pallas_matvec if self.use_pallas else None,
            materialize_threshold=self.materialize_threshold,
            # NOTE: the bf16 tile cache (rbf_pallas_closure) is NOT wired by
            # default — bf16(K)+D goes indefinite at large N (see the
            # closure's docstring / BASELINE.md).
        )

    def train_operator(self, params: GPParams, x):
        kxx = self.covariance(params, x)
        return kxx.add_diagonal(_softplus(params.raw_noise))

    def neg_mll(self, params: GPParams, x, y, *, key=None) -> jax.Array:
        """Negative marginal log-likelihood, averaged over data points.

        x: (*b, n, d); y: (*b, n).  Batch dims = independent GPs (the
        data-parallel axis).
        """
        n = y.shape[-1]
        K = self.train_operator(params, x)
        iq, ld = inv_quad_logdet(K, y[..., None], logdet=True, key=key)
        return 0.5 * jnp.mean(iq + ld + n * jnp.log(2.0 * jnp.pi)) / n

    def posterior(self, params: GPParams, x, y, x_star, *, key=None):
        """Predictive mean and variance at x_star."""
        # Share one preconditioner factor across the mean and variance
        # solves (reference memoizes _preconditioner per operator); no-op
        # when preconditioning is gated off.
        K = self.train_operator(params, x).with_preconditioner()
        # ONE batched CG over [y | k_star^T]: predictive mean and variance
        # solves share every kernel mat-vec — extra rhs columns ride the
        # same MXU contraction (BASELINE.md probe-sweep table), so this is
        # ~2x the separate-solves formulation for m <= ~100 query points.
        # The (m, n) cross block is formed ONCE and reused for the rhs, the
        # mean contraction, and the variance downdate.
        ks_t = self.covariance(params, x_star, x).mT.to_dense()  # (*b, n, m)
        # y may carry batch dims that x (and hence ks_t) lacks, or vice
        # versa — broadcast both operands to the joint batch shape before
        # stacking (solve() broadcasts rhs batch dims, so this preserves the
        # separate-solves semantics for (B, n) targets over shared inputs).
        y_col = y[..., None]  # (*by, n, 1)
        batch = jnp.broadcast_shapes(y_col.shape[:-1], ks_t.shape[:-1])
        ks_t = jnp.broadcast_to(ks_t, (*batch, ks_t.shape[-1]))
        stacked = jnp.concatenate(
            [jnp.broadcast_to(y_col, (*batch, 1)), ks_t], axis=-1
        )
        sol = solve(K, stacked)
        alpha, v = sol[..., :1], sol[..., 1:]
        mean = jnp.einsum("...nm,...no->...m", ks_t, alpha)
        k_ss_diag = self.covariance(params, x_star).diagonal()
        var = k_ss_diag - jnp.einsum("...nm,...nm->...m", ks_t, v)
        return mean, jnp.maximum(var, 0.0)

    # -- cached prediction (the LOVE workflow; Pleiss et al. 2018) ---------

    def posterior_cache(self, params: GPParams, x, y, *, key=None) -> "PosteriorCache":
        """Precompute the training-dependent solves once: the weight vector
        ``alpha = K^{-1} y`` and an inverse root ``R`` with ``R R^T ≈ K^{-1}``
        (GPyTorch's LOVE / ``model.eval()`` prediction caches, built on
        ``root_inv_decomposition`` — the functional analog of the reference's
        memoized prediction strategy).  The cache is a pytree: jit through
        it, reuse it across any number of query batches."""
        # share one preconditioner factor between the alpha solve and the
        # root-inv Lanczos (no-op when preconditioning is gated off)
        K = self.train_operator(params, x).with_preconditioner()
        alpha = solve(K, y[..., None])
        r_inv = K.root_inv_decomposition(key=key).root.to_dense()
        return PosteriorCache(alpha=alpha, root_inv=r_inv)

    def posterior_from_cache(
        self, params: GPParams, x, cache: "PosteriorCache", x_star
    ):
        """Predictive mean/variance at ``x_star`` in O(m·n·k) from the cache
        — no solves at query time (constant-time-per-query LOVE contract)."""
        k_star = self.covariance(params, x_star, x)  # (*b, m, n)
        mean = (k_star @ cache.alpha)[..., 0]
        v = k_star @ cache.root_inv  # (*b, m, k)
        k_ss_diag = self.covariance(params, x_star).diagonal()
        var = k_ss_diag - jnp.sum(v * v, axis=-1)
        return mean, jnp.maximum(var, 0.0)

    def posterior_distribution(self, params: GPParams, x, y, x_star, *, key=None):
        """Full joint predictive as a lazy-covariance ``MultivariateNormal``
        (GPyTorch's ``model(x_star)`` workflow): covariance = K_ss - K_s*
        K^{-1} K_*s, kept as a lazy Sum of the prior operator and a
        downdate root — never densified at x_star scale."""
        from ..distributions import MultivariateNormal
        from ..operators import ConstantMulLinearOperator, RootLinearOperator

        cache = self.posterior_cache(params, x, y, key=key)
        k_star = self.covariance(params, x_star, x)  # (*b, m, n)
        mean = (k_star @ cache.alpha)[..., 0]
        k_ss = self.covariance(params, x_star)
        # downdate root: K_s* R with R an inverse root of K -> cov = K_ss - V V^T
        v = k_star @ cache.root_inv  # (*b, m, k)
        downdate = ConstantMulLinearOperator(
            RootLinearOperator(v), jnp.asarray(-1.0, dtype=v.dtype)
        )
        return MultivariateNormal(mean, (k_ss + downdate).add_jitter(1e-6))
