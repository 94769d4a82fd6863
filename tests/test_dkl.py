"""Deep kernel learning: end-to-end gradients through the kernel operator's
data leaves, training progress, and cached prediction parity."""

import unittest

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu import settings
from linear_operator_tpu.models import DeepKernelGPRegression
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _data(n=100, d=5, key=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (n, d), dtype=jnp.float64)
    # target depends on a 1-D nonlinear projection: the regime DKL is for
    t = jnp.tanh(x @ jnp.linspace(-1.0, 1.0, d))
    y = jnp.sin(3.0 * t) + 0.05 * jax.random.normal(ky, (n,), dtype=jnp.float64)
    return x, y


class TestDKL(BaseTestCase):
    def _model_params(self, d=5):
        model = DeepKernelGPRegression(hidden=(16, 8, 2))
        params = model.init_params(d, key=jax.random.PRNGKey(3), dtype=jnp.float64)
        return model, params

    def test_mll_finite_and_grads_reach_mlp(self):
        x, y = _data()
        model, params = self._model_params()
        val, grads = jax.value_and_grad(lambda p: model.neg_mll(p, x, y))(params)
        assert np.isfinite(float(val))
        # every MLP weight/bias receives a nonzero gradient through
        # inv_quad_logdet -> KernelLinearOperator data leaves
        for g in (*grads.mlp.weights, *grads.mlp.biases):
            assert np.all(np.isfinite(np.asarray(g)))
            assert float(jnp.max(jnp.abs(g))) > 0.0
        for g in grads.gp:
            assert np.all(np.isfinite(np.asarray(g)))

    def test_grads_match_cg_and_cholesky(self):
        """Data-leaf gradients agree between the dense-Cholesky and the
        CG/stochastic paths (unbiasedness through the custom VJPs)."""
        x, y = _data(n=64)
        model, params = self._model_params()

        def loss(p):
            return model.neg_mll(p, x, y, key=jax.random.PRNGKey(0))

        with settings.max_cholesky_size(1000):
            g_chol = jax.grad(loss)(params)
        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
             settings.max_cg_iterations(200), settings.num_trace_samples(2048), \
             settings.min_preconditioning_size(10**9):
            g_cg = jax.grad(loss)(params)
        # the logdet gradient is stochastic; max normalized error measured
        # 0.14 @ 2048 probes and halves per 4x probes (unbiased MC)
        for a, b in zip(jax.tree_util.tree_leaves(g_chol), jax.tree_util.tree_leaves(g_cg)):
            scale = float(jnp.max(jnp.abs(a))) + 1e-12
            self.assertAllClose(b / scale, a / scale, rtol=0.0, atol=0.25)

    def test_training_improves_mll_and_fit(self):
        x, y = _data(n=120)
        model, params = self._model_params()

        loss_fn = jax.jit(lambda p: model.neg_mll(p, x, y))
        grad_fn = jax.jit(jax.grad(lambda p: model.neg_mll(p, x, y)))
        l0 = float(loss_fn(params))
        lr = 0.05
        for _ in range(40):
            g = grad_fn(params)
            params = jax.tree_util.tree_map(lambda p, gi: p - lr * gi, params, g)
        l1 = float(loss_fn(params))
        assert l1 < l0 - 0.05, (l0, l1)

        mean, var = model.posterior(params, x, y, x)
        assert float(jnp.mean((mean - y) ** 2)) < 0.05
        assert np.all(np.asarray(var) >= 0.0)

    def test_cached_prediction_matches_direct(self):
        x, y = _data(n=80)
        xs, _ = _data(n=17, key=7)
        model, params = self._model_params()
        with settings.max_cholesky_size(1000):
            mean_d, var_d = model.posterior(params, x, y, xs)
            cache = model.posterior_cache(params, x, y)
            mean_c, var_c = model.posterior_from_cache(params, x, cache, xs)
        self.assertAllClose(mean_c, mean_d, rtol=1e-4, atol=1e-6)
        self.assertAllClose(var_c, var_d, rtol=5e-2, atol=1e-4)

    def test_feature_dim_drives_kernel(self):
        x, y = _data(n=30, d=7)
        model = DeepKernelGPRegression(hidden=(8, 3))
        params = model.init_params(7, dtype=jnp.float64)
        z = model.features(params, x)
        assert z.shape == (30, 3)
        K = model.train_operator(params, x)
        assert K.shape == (30, 30)
        dense = K.to_dense()
        self.assertAllClose(dense, dense.T, atol=1e-12)


if __name__ == "__main__":
    unittest.main()
