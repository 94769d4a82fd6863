"""Multitask GP tests: Kronecker covariance vs dense ground truth, training,
prediction."""

import jax
import jax.numpy as jnp

from linear_operator_tpu import settings
from linear_operator_tpu.models import MultitaskGPRegression
from linear_operator_tpu.test.base_test_case import BaseTestCase


class TestMultitaskGP(BaseTestCase):
    def _setup(self, n=30, T=3, d=2, dtype=jnp.float64):
        model = MultitaskGPRegression(num_tasks=T, task_rank=2)
        x = jax.random.normal(jax.random.PRNGKey(160), (n, d), dtype)
        y = jnp.stack(
            [jnp.sin(2 * x[:, 0] + i) for i in range(T)], axis=-1
        ) + 0.05 * jax.random.normal(jax.random.PRNGKey(161), (n, T), dtype)
        params = model.init_params(d, dtype=dtype)
        return model, params, x, y

    def test_mll_matches_dense(self):
        model, params, x, y = self._setup()
        n, T = y.shape
        Kxx = model.data_covar(params, x)
        Ktt = model.task_covar(params)
        noise = jax.nn.softplus(params.raw_noise) + 1e-6
        K = jnp.kron(Kxx, Ktt) + noise * jnp.eye(n * T)
        yv = y.reshape(-1)
        mll_dense = 0.5 * (
            yv @ jnp.linalg.solve(K, yv)
            + jnp.linalg.slogdet(K)[1]
            + n * T * jnp.log(2 * jnp.pi)
        ) / (n * T)
        mll_lazy = model.neg_mll(params, x, y)
        self.assertAllClose(mll_lazy, mll_dense, rtol=1e-7, atol=1e-8)

    def test_training_reduces_loss(self):
        import optax

        model, params, x, y = self._setup(dtype=jnp.float32)
        opt = optax.adam(0.05)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            l, g = jax.value_and_grad(lambda p: model.neg_mll(p, x, y))(params)
            updates, state = opt.update(g, state, params)
            return jax.tree_util.tree_map(lambda a, b: a + b, params, updates), state, l

        losses = []
        for _ in range(20):
            params, state, l = step(params, state)
            losses.append(float(l))
        self.assertLess(losses[-1], losses[0])

    def test_posterior_mean_matches_dense(self):
        model, params, x, y = self._setup()
        n, T = y.shape
        x_star = x[:5]
        mean = model.posterior_mean(params, x, y, x_star)
        Kxx = model.data_covar(params, x)
        Ktt = model.task_covar(params)
        noise = jax.nn.softplus(params.raw_noise) + 1e-6
        K = jnp.kron(Kxx, Ktt) + noise * jnp.eye(n * T)
        Ks = jnp.kron(model.data_covar(params, x_star, x), Ktt)
        mean_dense = (Ks @ jnp.linalg.solve(K, y.reshape(-1))).reshape(5, T)
        self.assertAllClose(mean, mean_dense, rtol=1e-6, atol=1e-7)


class TestMultitaskPosteriorVariance(BaseTestCase):
    def test_posterior_variance_matches_dense(self):
        n, T, m = 30, 3, 9
        kx, ky = jax.random.split(jax.random.PRNGKey(4))
        x = jax.random.normal(kx, (n, 2), jnp.float64)
        y = jnp.stack(
            [jnp.sin(2 * x[:, 0]), jnp.cos(x[:, 1]), x[:, 0] * x[:, 1]], axis=-1
        )
        xs = jax.random.normal(ky, (m, 2), jnp.float64)
        model = MultitaskGPRegression(num_tasks=T, task_rank=2)
        params = model.init_params(2, dtype=jnp.float64)

        with settings.max_root_decomposition_size(n * T), \
             settings.max_cholesky_size(1000):
            mean, var = model.posterior(params, x, y, xs)

        K = model.train_operator(params, x).to_dense()
        ks = jnp.kron(model.data_covar(params, xs, x), model.task_covar(params))
        kss = jnp.kron(model.data_covar(params, xs), model.task_covar(params))
        sol = jnp.linalg.solve(K, ks.T)
        mean_d = (ks @ jnp.linalg.solve(K, y.reshape(-1))).reshape(m, T)
        var_d = (jnp.diag(kss) - jnp.sum(ks * sol.T, axis=-1)).reshape(m, T)
        self.assertAllClose(mean, mean_d, rtol=1e-6, atol=1e-8)
        self.assertAllClose(var, var_d, rtol=5e-2, atol=1e-4)
        self.assertTrue(bool(jnp.all(var >= 0)))
