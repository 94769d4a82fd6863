"""SGPR (inducing-point) model: ELBO bound correctness, Woodbury routing,
posterior quality, training."""

import unittest
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu import settings
from linear_operator_tpu.models import ExactGPRegression, SGPRRegression
from linear_operator_tpu.operators.low_rank_root_added_diag import (
    LowRankRootAddedDiagLinearOperator,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _data(n=120, d=2, key=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float64)
    y = jnp.sin(2.0 * x[:, 0]) + 0.05 * jax.random.normal(
        ky, (n,), dtype=jnp.float64
    )
    return x, y


class TestSGPR(BaseTestCase):
    def test_operator_routing(self):
        """The marginal term must be a LowRankRootAddedDiag (exact Woodbury,
        no n x n factorization)."""
        x, y = _data()
        model = SGPRRegression()
        params = model.init_params(x, 20)
        op = model.train_operator(params, x)
        self.assertIsInstance(op, LowRankRootAddedDiagLinearOperator)
        rhs = jnp.ones((x.shape[0], 1), jnp.float64)
        self.assertIsNotNone(op._solve_structure(rhs))

    def test_elbo_lower_bounds_exact_mll(self):
        """Titsias bound: ELBO <= exact log marginal likelihood, with the
        gap closing as m -> n."""
        x, y = _data(n=100)
        exact = ExactGPRegression()
        gp_params = exact.init_params(x.shape[1], dtype=jnp.float64)
        with settings.fast_computations(log_prob=False, solves=False):
            exact_ll = -exact.neg_mll(gp_params, x, y) * y.shape[0]

        model = SGPRRegression()
        last = -jnp.inf
        for m in (10, 40, 100):
            params = model.init_params(x, m)
            elbo = model.elbo(params, x, y)
            self.assertLessEqual(float(elbo), float(exact_ll) + 1e-6)
            self.assertGreaterEqual(float(elbo), float(last) - 1e-6)
            last = elbo
        # at m = n the bound is tight
        self.assertAllClose(last, exact_ll, rtol=1e-5, atol=1e-4)

    def test_elbo_matches_dense_computation(self):
        x, y = _data(n=80)
        model = SGPRRegression()
        params = model.init_params(x, 25)
        elbo = model.elbo(params, x, y)

        from linear_operator_tpu.operators.kernel import rbf_covar

        ls = jax.nn.softplus(params.raw_lengthscale) + 1e-6
        os_ = jax.nn.softplus(params.raw_outputscale) + 1e-6
        noise = jax.nn.softplus(params.raw_noise) + 1e-6
        n = y.shape[0]
        k_nm = rbf_covar(x, params.z, lengthscale=ls, outputscale=os_)
        k_mm = rbf_covar(params.z, params.z, lengthscale=ls, outputscale=os_) \
            + model.jitter * os_ * jnp.eye(25, dtype=jnp.float64)
        q = k_nm @ jnp.linalg.solve(k_mm, k_nm.T)
        cov = q + noise * jnp.eye(n, dtype=jnp.float64)
        gauss = -0.5 * (
            y @ jnp.linalg.solve(cov, y)
            + jnp.linalg.slogdet(cov)[1]
            + n * jnp.log(2 * jnp.pi)
        )
        expected = gauss - 0.5 * (n * os_ - jnp.trace(q)) / noise
        self.assertAllClose(elbo, expected, rtol=1e-8, atol=1e-8)

    def test_posterior_close_to_exact(self):
        """With m = n inducing points at the data, SGPR posterior ~= exact
        GP posterior."""
        x, y = _data(n=90)
        xs = jax.random.normal(jax.random.PRNGKey(5), (15, 2), dtype=jnp.float64)
        model = SGPRRegression()
        params = model.init_params(x, 90)
        mean, var = model.posterior(params, x, y, xs)

        exact = ExactGPRegression()
        gp_params = exact.init_params(2, dtype=jnp.float64)
        with settings.fast_computations(log_prob=False, solves=False):
            mean_e, var_e = exact.posterior(gp_params, x, y, xs)
        # m = n with K_mm jitter: agreement to jitter level, not machine eps
        self.assertAllClose(mean, mean_e, rtol=1e-3, atol=1e-4)
        self.assertAllClose(var, var_e, rtol=1e-3, atol=1e-4)

    def test_training_improves_elbo(self):
        import optax

        x, y = _data(n=150)
        model = SGPRRegression()
        params = model.init_params(x, 15)
        opt = optax.adam(3e-2)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            loss, grads = jax.value_and_grad(model.neg_elbo)(params, x, y)
            updates, state = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state, loss

        losses = []
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for _ in range(30):
                params, state, l = step(params, state)
                losses.append(float(l))
        self.assertLess(losses[-1], losses[0])
        self.assertTrue(np.isfinite(losses).all())


if __name__ == "__main__":
    unittest.main()
