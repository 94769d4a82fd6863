"""SKI / KISS-GP model tests: interpolated Toeplitz/Kronecker covariance vs
the exact RBF kernel, training, prediction."""

import jax
import jax.numpy as jnp

from linear_operator_tpu import settings
from linear_operator_tpu.models import SKIGPRegression, make_grid
from linear_operator_tpu.models.ski import linear_interp_weights
from linear_operator_tpu.test.base_test_case import BaseTestCase


class TestSKI(BaseTestCase):
    def test_interp_weights_partition_of_unity(self):
        x = jax.random.uniform(self.key, (50, 2), dtype=jnp.float64)
        grid = make_grid(x, (16, 16))
        idx, w = linear_interp_weights(x, grid)
        self.assertEqual(idx.shape, (50, 4))
        self.assertAllClose(jnp.sum(w, axis=-1), jnp.ones(50), rtol=1e-12, atol=1e-12)
        self.assertTrue(bool(jnp.all(idx >= 0)))
        self.assertTrue(bool(jnp.all(idx < 16 * 16)))

    def test_ski_covariance_close_to_exact(self):
        """With a dense grid, SKI covariance ~= exact RBF covariance."""
        n = 40
        x = jax.random.uniform(self.key, (n, 1), dtype=jnp.float64) * 2 - 1
        model = SKIGPRegression(make_grid(x, (400,)))
        params = model.init_params(1, dtype=jnp.float64)
        K_ski = model.covariance(params, x).to_dense()
        ls = jax.nn.softplus(params.raw_lengthscale) + 1e-6
        os_ = jax.nn.softplus(params.raw_outputscale) + 1e-6
        d2 = (x[:, None, 0] - x[None, :, 0]) ** 2
        K_exact = os_ * jnp.exp(-0.5 * d2 / ls[0] ** 2)
        self.assertAllClose(K_ski, K_exact, rtol=1e-3, atol=1e-3)

    def test_ski_2d_mll_and_training(self):
        import optax

        n = 120
        x = jax.random.uniform(self.key, (n, 2), dtype=jnp.float32)
        y = jnp.sin(4 * x[:, 0]) * jnp.cos(3 * x[:, 1])
        model = SKIGPRegression(make_grid(x, (24, 24)))
        params = model.init_params(2)
        opt = optax.adam(0.05)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss(p):
                with settings.max_cholesky_size(0), settings.num_trace_samples(8), \
                     settings.max_cg_iterations(100), settings.cg_tolerance(1e-4), \
                     settings.min_preconditioning_size(10**9):
                    return model.neg_mll(p, x, y, key=jax.random.PRNGKey(0))

            l, g = jax.value_and_grad(loss)(params)
            updates, state2 = opt.update(g, state, params)
            params2 = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
            return params2, state2, l

        losses = []
        for _ in range(15):
            params, state, l = step(params, state)
            losses.append(float(l))
        self.assertLess(losses[-1], losses[0])

    def test_ski_posterior_interpolates(self):
        n = 80
        x = jnp.linspace(-1, 1, n, dtype=jnp.float64)[:, None]
        y = jnp.sin(3 * x[:, 0])
        model = SKIGPRegression(make_grid(x, (200,)))
        params = model.init_params(1, dtype=jnp.float64)
        mean = model.posterior_mean(params, x, y, x)
        self.assertAllClose(mean, y, rtol=0.2, atol=0.2)

    def test_ski_posterior_variance_matches_dense(self):
        """LOVE-style SKI predictive variance vs the exact dense computation
        on the same (interpolated) covariance."""
        n = 60
        x = jax.random.uniform(self.key, (n, 1), dtype=jnp.float64) * 2 - 1
        y = jnp.sin(3.0 * x[:, 0])
        xs = jnp.linspace(-0.9, 0.9, 13, dtype=jnp.float64)[:, None]
        model = SKIGPRegression(make_grid(x, (64,)), interp="cubic")
        params = model.init_params(1, dtype=jnp.float64)

        with settings.max_cholesky_size(0), settings.max_root_decomposition_size(80), \
             settings.cg_tolerance(1e-12), settings.max_cg_iterations(300):
            mean, var = model.posterior(params, x, y, xs)

        K = model.train_operator(params, x).to_dense()
        ks = model.covariance(params, xs, x).to_dense()
        kss = model.covariance(params, xs).to_dense()
        sol = jnp.linalg.solve(K, ks.T)
        mean_d = ks @ jnp.linalg.solve(K, y)
        var_d = jnp.diag(kss) - jnp.sum(ks * sol.T, axis=-1)
        self.assertAllClose(mean, mean_d, rtol=1e-5, atol=1e-7)
        self.assertAllClose(var, var_d, rtol=5e-2, atol=1e-4)
        self.assertTrue(bool(jnp.all(var >= 0)))
