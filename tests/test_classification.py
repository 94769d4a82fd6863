"""SVGP classification (Bernoulli likelihood): quadrature goldens, probit
analytic-prediction identity, minibatch unbiasedness, training accuracy on a
separable task, gradient flow (GPyTorch VariationalGP+BernoulliLikelihood
parity; models/classification.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu.models import SVGPClassification, gauss_hermite_expectation
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _class_data(n=120, key=0):
    """1-D binary task: y = 1 iff sin(2x) + small noise > 0."""
    kx, kn = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.uniform(
        kx, (n, 1), dtype=jnp.float64, minval=-2.0, maxval=2.0
    )
    f = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(kn, (n,), dtype=jnp.float64)
    return x, (f > 0).astype(jnp.float64)


def _train(model, params, x, y, steps=300, lr=0.05, num_data=None):
    import optax

    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        v, g = jax.value_and_grad(model.neg_elbo)(p, x, y, num_data=num_data)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, v

    for _ in range(steps):
        params, state, _ = step(params, state)
    return params


class TestGaussHermite(BaseTestCase):
    def test_moments_golden(self):
        mean = jnp.asarray([0.3, -1.2], dtype=jnp.float64)
        var = jnp.asarray([0.5, 2.0], dtype=jnp.float64)
        m1 = gauss_hermite_expectation(lambda f: f, mean, var)
        m2 = gauss_hermite_expectation(lambda f: f**2, mean, var)
        self.assertAllClose(m1, mean, rtol=1e-12, atol=1e-12)
        self.assertAllClose(m2, var + mean**2, rtol=1e-12, atol=1e-12)

    def test_sigmoid_expectation_vs_dense_integration(self):
        mean = jnp.asarray(0.7, dtype=jnp.float64)
        var = jnp.asarray(1.3, dtype=jnp.float64)
        est = float(gauss_hermite_expectation(jax.nn.sigmoid, mean, var, 40))
        f = np.linspace(-12, 12, 40001)
        pdf = np.exp(-0.5 * (f - 0.7) ** 2 / 1.3) / np.sqrt(2 * np.pi * 1.3)
        exact = np.trapezoid(1.0 / (1.0 + np.exp(-f)) * pdf, f)
        self.assertAllClose(est, exact, rtol=1e-8, atol=1e-8)


class TestSVGPClassification(BaseTestCase):
    def test_probit_predictive_identity(self):
        """E_{N(mu,var)}[Phi(f)] = Phi(mu / sqrt(1+var)): the analytic
        predict_proba must match quadrature of the link."""
        x, y = _class_data(n=60)
        model = SVGPClassification()
        params = model.init_params(x, 16)
        mean, var = model.predictive(params, x)
        analytic = model.predict_proba(params, x)
        quad = gauss_hermite_expectation(
            jax.scipy.stats.norm.cdf, mean, var, 40
        )
        self.assertAllClose(analytic, quad, rtol=1e-8, atol=1e-8)

    def test_expected_log_lik_golden(self):
        """Per-point E_q[log p(y|f)] vs dense numerical integration."""
        x, y = _class_data(n=8)
        for lik in ("probit", "logit"):
            model = SVGPClassification(likelihood=lik)
            params = model.init_params(x, 4)
            mean, var = model.predictive(params, x)
            ell = np.asarray(model.expected_log_lik(params, x, y))
            f = np.linspace(-15, 15, 60001)
            for i in range(8):
                mu, v = float(mean[i]), float(var[i])
                sign = 2.0 * float(y[i]) - 1.0
                pdf = np.exp(-0.5 * (f - mu) ** 2 / v) / np.sqrt(2 * np.pi * v)
                if lik == "probit":
                    from scipy.stats import norm as _norm  # CPU test only

                    ll = _norm.logcdf(sign * f)
                else:
                    ll = -np.logaddexp(0.0, -sign * f)
                exact = np.trapezoid(ll * pdf, f)
                self.assertAllClose(ell[i], exact, rtol=1e-6, atol=1e-6)

    def test_minibatch_elbo_unbiased(self):
        x, y = _class_data(n=60)
        model = SVGPClassification()
        params = model.init_params(x, 12)
        full = float(model.elbo(params, x, y))
        kl = float(model.kl(params))
        parts = []
        for i in range(6):
            sl = slice(10 * i, 10 * (i + 1))
            parts.append(
                float(model.elbo(params, x[sl], y[sl], num_data=60)) + kl
            )
        est = sum(parts) / 6 - kl
        self.assertAllClose(est, full, rtol=1e-10, atol=1e-8)

    def test_training_separates_classes(self):
        x, y = _class_data(n=150)
        for lik in ("probit", "logit"):
            model = SVGPClassification(likelihood=lik)
            params = model.init_params(x, 20)
            elbo0 = float(model.elbo(params, x, y))
            trained = _train(model, params, x, y, steps=300)
            self.assertGreater(float(model.elbo(trained, x, y)), elbo0)
            proba = model.predict_proba(trained, x)
            self.assertTrue(bool(jnp.all((proba >= 0.0) & (proba <= 1.0))))
            acc = float(jnp.mean(model.predict(trained, x) == y))
            self.assertGreater(acc, 0.9, msg=f"{lik}: train acc {acc}")

    def test_gradients_flow(self):
        x, y = _class_data(n=40)
        model = SVGPClassification()
        params = model.init_params(x, 10)
        g = jax.grad(model.neg_elbo)(params, x, y)
        for name, leaf in g._asdict().items():
            self.assertTrue(
                bool(jnp.all(jnp.isfinite(leaf))), msg=f"{name} not finite"
            )
            if name == "raw_noise":  # unused by the Bernoulli likelihood
                continue
            self.assertGreater(
                float(jnp.abs(leaf).sum()), 0.0, msg=f"{name} zero grad"
            )


class TestSVGPPoisson(BaseTestCase):
    """Poisson SVGP (log link): closed-form expected log-lik vs quadrature,
    training on synthetic counts, rate recovery."""

    def test_expected_log_lik_matches_quadrature(self):
        from linear_operator_tpu.models import SVGPPoissonRegression

        model = SVGPPoissonRegression()
        x = jnp.linspace(-1.0, 1.0, 24, dtype=jnp.float64)[:, None]
        y = jnp.asarray(np.random.default_rng(0).poisson(2.0, 24), jnp.float64)
        params = model.init_params(x, num_inducing=8)
        closed = model.expected_log_lik(params, x, y)
        mean, var = model.predictive(params, x)
        quad = gauss_hermite_expectation(
            lambda f: y[..., None] * f
            - jnp.exp(f)
            - jax.lax.lgamma(y[..., None] + 1.0),
            mean,
            var,
            num_points=60,
        )
        self.assertAllClose(closed, quad, rtol=1e-8, atol=1e-8)

    def test_training_recovers_rates(self):
        from linear_operator_tpu.models import SVGPPoissonRegression

        rng = np.random.default_rng(3)
        n = 200
        x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0), jnp.float64)
        true_rate = jnp.exp(1.0 + jnp.sin(2.0 * x[:, 0]))
        y = jnp.asarray(rng.poisson(np.asarray(true_rate)), jnp.float64)

        model = SVGPPoissonRegression()
        params = model.init_params(x, num_inducing=24)
        e0 = float(model.elbo(params, x, y))
        params = _train(model, params, x, y, steps=400, lr=0.05)
        e1 = float(model.elbo(params, x, y))
        assert e1 > e0 + 10.0, (e0, e1)

        rate = model.predict_rate(params, x)
        # relative error of the fitted rate curve (Poisson noise floor ~1/sqrt(rate))
        rel = float(jnp.mean(jnp.abs(rate - true_rate) / true_rate))
        assert rel < 0.35, rel
