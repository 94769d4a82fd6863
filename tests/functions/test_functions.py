"""Functional-API tests (reference: test/functions/*)."""

import jax
import jax.numpy as jnp
import numpy as np

import linear_operator_tpu as lo
from linear_operator_tpu import settings
from linear_operator_tpu.operators import DenseLinearOperator
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _psd(key, *batch, n=32, cond=50.0):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    q, _ = jnp.linalg.qr(a)
    evals = jnp.logspace(0, np.log10(cond), n, dtype=jnp.float64)
    return (q * evals) @ jnp.swapaxes(q, -1, -2)


class TestSolveFunction(BaseTestCase):
    def test_solve_matches_dense_cg_path(self):
        K = _psd(self.key, n=64)
        op = DenseLinearOperator(K)
        b = jax.random.normal(self.key, (64, 3), dtype=jnp.float64)
        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-12), \
             settings.max_cg_iterations(1000):
            x = lo.solve(op, b)
        self.assertAllClose(x, jnp.linalg.solve(K, b), rtol=1e-8, atol=1e-8)

    def test_solve_gradients_match_dense(self):
        K = _psd(self.key, n=24)
        b = jax.random.normal(self.key, (24, 2), dtype=jnp.float64)

        def f(K):
            return jnp.sum(jnp.cos(lo.solve(DenseLinearOperator(K), b)))

        def g(K):
            return jnp.sum(jnp.cos(jnp.linalg.solve(K, b)))

        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-13), \
             settings.max_cg_iterations(2000):
            ga = jax.grad(f)(K)
        ge = jax.grad(g)(K)
        self.assertAllClose(ga, ge, rtol=1e-5, atol=1e-7)

    def test_solve_rhs_gradient(self):
        K = _psd(self.key, n=24)
        b = jax.random.normal(self.key, (24, 2), dtype=jnp.float64)
        op = DenseLinearOperator(K)

        ga = jax.grad(lambda b: jnp.sum(jnp.sin(lo.solve(op, b))))(b)
        ge = jax.grad(lambda b: jnp.sum(jnp.sin(jnp.linalg.solve(K, b))))(b)
        self.assertAllClose(ga, ge, rtol=1e-6, atol=1e-8)

    def test_solve_second_order(self):
        K = _psd(self.key, n=10)
        b = jax.random.normal(self.key, (10,), dtype=jnp.float64)

        def f(s):
            return jnp.sum(lo.solve(DenseLinearOperator(K * s), b) ** 2)

        def g(s):
            return jnp.sum(jnp.linalg.solve(K * s, b) ** 2)

        h_a = jax.grad(jax.grad(f))(1.0)
        h_e = jax.grad(jax.grad(g))(1.0)
        self.assertAllClose(h_a, h_e, rtol=1e-6, atol=1e-8)


class TestInvQuadLogdet(BaseTestCase):
    def test_stochastic_logdet_converges_in_probes(self):
        K = _psd(self.key, n=128, cond=20.0)
        op = DenseLinearOperator(K)
        ld_true = jnp.linalg.slogdet(K)[1]
        errs = []
        for m in (8, 256):
            with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
                 settings.num_trace_samples(m), settings.max_cg_iterations(500), \
                 settings.max_lanczos_quadrature_iterations(64):
                _, ld = lo.inv_quad_logdet(op, logdet=True, key=jax.random.PRNGKey(5))
            errs.append(abs(float(ld - ld_true)))
        self.assertLess(errs[-1], max(0.05 * abs(float(ld_true)), 0.5))

    def test_skip_logdet_forward_shapes(self):
        K = _psd(self.key, n=16)
        op = DenseLinearOperator(K)
        b = jax.random.normal(self.key, (16, 2), dtype=jnp.float64)
        iq, ld = lo.inv_quad_logdet(op, b, logdet=False)
        self.assertEqual(iq.shape, ())
        self.assertEqual(ld.shape, ())

    def test_batched(self):
        K = _psd(self.key, 3, n=16)
        op = DenseLinearOperator(K)
        b = jax.random.normal(self.key, (3, 16, 2), dtype=jnp.float64)
        iq, ld = lo.inv_quad_logdet(op, b, logdet=True)
        iq_true = jnp.sum(jnp.linalg.solve(K, b) * b, axis=(-2, -1))
        ld_true = jnp.linalg.slogdet(K)[1]
        self.assertAllClose(iq, iq_true, rtol=1e-6, atol=1e-8)
        self.assertAllClose(ld, ld_true, rtol=1e-6, atol=1e-8)


class TestRootDecomposition(BaseTestCase):
    def test_lanczos_root_grad(self):
        K = _psd(self.key, n=16, cond=10.0)
        key = jax.random.PRNGKey(3)

        def f(K):
            with settings.max_cholesky_size(0), settings.max_root_decomposition_size(16):
                r = lo.root_decomposition(DenseLinearOperator(K), key=key)
            return jnp.sum(r.to_dense())

        # With full-size Lanczos the root reproduces K, so d sum(RR^T)/dK = 1.
        g = jax.grad(f)(K)
        self.assertAllClose(g, jnp.ones_like(K), rtol=1e-4, atol=1e-4)
