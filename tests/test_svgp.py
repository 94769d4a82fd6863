"""SVGP (uncollapsed variational) model: bound correctness vs the exact MLL
and the collapsed SGPR bound, minibatch unbiasedness, KL golden, training,
posterior quality (Hensman et al. 2013; GPyTorch's variational stack)."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu import settings
from linear_operator_tpu.models import (
    ExactGPRegression,
    SGPRRegression,
    SVGPRegression,
)
from linear_operator_tpu.models.svgp import _var_root
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _data(n=120, d=1, key=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float64)
    y = jnp.sin(2.0 * x[:, 0]) + 0.05 * jax.random.normal(
        ky, (n,), dtype=jnp.float64
    )
    return x, y


def _train(model, params, x, y, steps=400, lr=0.05):
    import optax

    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        v, g = jax.value_and_grad(model.neg_elbo)(p, x, y)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, v

    for _ in range(steps):
        params, state, _ = step(params, state)
    return params


class TestSVGP(BaseTestCase):
    def test_elbo_lower_bounds_exact_mll(self):
        """ELBO <= collapsed (SGPR) bound at the same hypers/inducing points
        <= exact MLL; the optimal q closes the first gap."""
        x, y = _data(n=90)
        exact = ExactGPRegression()
        gp_params = exact.init_params(x.shape[1], dtype=jnp.float64)
        with settings.fast_computations(log_prob=False, solves=False):
            exact_ll = float(-exact.neg_mll(gp_params, x, y) * y.shape[0])

        svgp = SVGPRegression()
        params = svgp.init_params(x, 30)
        elbo0 = float(svgp.elbo(params, x, y))
        self.assertLess(elbo0, exact_ll)

        sgpr = SGPRRegression()
        sgpr_params = sgpr.init_params(x, 30)
        collapsed = float(sgpr.elbo(sgpr_params, x, y))
        # same hypers/z at init -> the collapsed bound dominates any q
        self.assertLessEqual(elbo0, collapsed + 1e-6)
        self.assertLess(collapsed, exact_ll)

        # training q (and hypers) tightens the bound but never crosses the
        # exact MLL at the SAME hypers — just check improvement + finiteness
        trained = _train(svgp, params, x, y, steps=200)
        elbo1 = float(svgp.elbo(trained, x, y))
        self.assertGreater(elbo1, elbo0)

    def test_minibatch_elbo_unbiased(self):
        """E over uniformly drawn minibatches of the rescaled data term
        equals the full-batch data term (KL is deterministic)."""
        x, y = _data(n=60)
        svgp = SVGPRegression()
        params = svgp.init_params(x, 16)
        full = float(svgp.elbo(params, x, y))
        kl = float(svgp.kl(params))
        # average the minibatch bound over a disjoint partition: exactly full
        parts = []
        for i in range(6):
            sl = slice(10 * i, 10 * (i + 1))
            parts.append(
                float(svgp.elbo(params, x[sl], y[sl], num_data=60)) + kl
            )
        est = sum(parts) / 6 - kl
        self.assertAllClose(est, full, rtol=1e-10, atol=1e-8)

    def test_kl_golden(self):
        """Whitened KL matches the dense Gaussian KL formula."""
        x, _ = _data(n=30)
        svgp = SVGPRegression()
        params = svgp.init_params(x, 8)
        raw = jax.random.normal(self.key, (8, 8), dtype=jnp.float64) * 0.3
        mu = jax.random.normal(self.key, (8,), dtype=jnp.float64)
        params = params._replace(var_root_raw=raw, var_mean=mu)
        r = _var_root(raw)
        s = np.asarray(r @ r.T)
        mu_np = np.asarray(mu)
        _, ld = np.linalg.slogdet(s)
        kl_exact = 0.5 * (np.trace(s) + mu_np @ mu_np - 8 - ld)
        self.assertAllClose(svgp.kl(params), kl_exact, rtol=1e-10, atol=1e-10)

    def test_optimal_q_recovers_exact_gp_at_m_eq_n(self):
        """With z = x (m = n), the trained SVGP posterior approaches the
        exact GP posterior at the same hypers."""
        x, y = _data(n=50)
        svgp = SVGPRegression(jitter=1e-8)
        params = svgp.init_params(x, 50)  # z = x
        params = _train(svgp, params, x, y, steps=1500, lr=0.03)

        exact = ExactGPRegression()
        gp_params = exact.init_params(x.shape[1], dtype=jnp.float64)
        # align hypers: copy the trained kernel/noise hypers into the exact GP
        gp_params = gp_params._replace(
            raw_lengthscale=params.raw_lengthscale,
            raw_outputscale=params.raw_outputscale,
            raw_noise=params.raw_noise,
        )
        xs = jnp.linspace(-2.0, 2.0, 20, dtype=jnp.float64)[:, None]
        with settings.fast_computations(log_prob=False, solves=False):
            mean_e, var_e = exact.posterior(gp_params, x, y, xs)
        mean_v, var_v = svgp.posterior(params, xs)
        self.assertAllClose(mean_v, mean_e, rtol=0.05, atol=0.05)
        self.assertAllClose(var_v, var_e, rtol=0.25, atol=0.02)

    def test_posterior_distribution_consistent(self):
        x, y = _data(n=40)
        svgp = SVGPRegression()
        params = svgp.init_params(x, 12)
        xs = jnp.linspace(-1.5, 1.5, 9, dtype=jnp.float64)[:, None]
        mvn = svgp.posterior_distribution(params, xs)
        mean, var = svgp.posterior(params, xs)
        self.assertAllClose(mvn.mean, mean, rtol=1e-8, atol=1e-8)
        self.assertAllClose(
            mvn.variance, var, rtol=1e-5, atol=1e-5
        )
        self.assertTrue(
            bool(jnp.isfinite(mvn.log_prob(mvn.rsample(jax.random.PRNGKey(0)))))
        )

    def test_gradients_flow_everywhere(self):
        x, y = _data(n=40)
        svgp = SVGPRegression()
        params = svgp.init_params(x, 10)
        g = jax.grad(svgp.neg_elbo)(params, x, y)
        for name, leaf in g._asdict().items():
            self.assertTrue(
                bool(jnp.all(jnp.isfinite(leaf))), msg=f"{name} not finite"
            )
            self.assertGreater(
                float(jnp.abs(leaf).sum()), 0.0, msg=f"{name} zero grad"
            )
