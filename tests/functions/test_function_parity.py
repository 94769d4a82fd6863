"""Function-layer parity tests mirroring the reference's dedicated
``test/functions/*`` files (test_solve.py lhs paths, test_inv_quad.py,
test_inv_quad_logdet.py gradient checks, test_diagonalization.py,
test_dsmm.py, test_pivoted_cholesky.py) — behaviors the golden operator
harness exercises only indirectly."""

import jax
import jax.numpy as jnp
import numpy as np

import linear_operator_tpu as lo
from linear_operator_tpu import settings
from linear_operator_tpu.functions import (
    diagonalization,
    dsmm,
    inv_quad,
    inv_quad_logdet,
    pivoted_cholesky,
    solve,
    sqrt_matmul_ciq,
)
from linear_operator_tpu.operators import DenseLinearOperator
from linear_operator_tpu.operators.interpolated import InterpolationMatrix
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _psd(key, *batch, n=20, cond=30.0):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    q, _ = jnp.linalg.qr(a)
    evals = jnp.logspace(0, np.log10(cond), n, dtype=jnp.float64)
    return (q * evals) @ jnp.swapaxes(q, -1, -2)


class TestSolveLhs(BaseTestCase):
    """solve(op, rhs, lhs) = lhs @ K^{-1} rhs (reference functions/_solve.py
    :48-52 folds lhs into the same solve batch)."""

    def _check(self, ctx):
        K = _psd(self.key, n=24)
        kb, kl = jax.random.split(jax.random.PRNGKey(7))
        b = jax.random.normal(kb, (24, 3), dtype=jnp.float64)
        L = jax.random.normal(kl, (5, 24), dtype=jnp.float64)
        with ctx():
            out = solve(DenseLinearOperator(K), b, lhs=L)
        self.assertAllClose(out, L @ jnp.linalg.solve(K, b), rtol=1e-7, atol=1e-9)

        def f(K):
            with ctx():
                return jnp.sum(jnp.sin(solve(DenseLinearOperator(K), b, lhs=L)))

        def g(K):
            return jnp.sum(jnp.sin(L @ jnp.linalg.solve(K, b)))

        self.assertAllClose(jax.grad(f)(K), jax.grad(g)(K), rtol=1e-5, atol=1e-7)

    def test_cholesky_path(self):
        self._check(lambda: settings.max_cholesky_size(1000))

    def test_cg_path(self):
        def ctx():
            import contextlib

            stack = contextlib.ExitStack()
            stack.enter_context(settings.max_cholesky_size(0))
            stack.enter_context(settings.cg_tolerance(1e-12))
            stack.enter_context(settings.max_cg_iterations(500))
            return stack

        self._check(ctx)


class TestInvQuad(BaseTestCase):
    def test_unreduced_per_column(self):
        """reduce_inv_quad=False returns one quadratic form per rhs column
        (reference functions/__init__.py:100-130)."""
        K = _psd(self.key, 2, n=16)
        b = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4), dtype=jnp.float64)
        iq = inv_quad(DenseLinearOperator(K), b, reduce_inv_quad=False)
        expected = jnp.sum(jnp.linalg.solve(K, b) * b, axis=-2)
        self.assertEqual(iq.shape, (2, 4))
        self.assertAllClose(iq, expected, rtol=1e-7, atol=1e-9)

    def test_unreduced_gradient(self):
        K = _psd(self.key, n=12)
        b = jax.random.normal(jax.random.PRNGKey(2), (12, 3), dtype=jnp.float64)
        w = jnp.asarray([1.0, -2.0, 0.5], dtype=jnp.float64)

        def f(K):
            return jnp.sum(w * inv_quad(DenseLinearOperator(K), b, reduce_inv_quad=False))

        def g(K):
            return jnp.sum(w * jnp.sum(jnp.linalg.solve(K, b) * b, axis=-2))

        self.assertAllClose(jax.grad(f)(K), jax.grad(g)(K), rtol=1e-6, atol=1e-8)


class TestInvQuadLogdetGradients(BaseTestCase):
    def test_deterministic_path_gradients_exact(self):
        """Below max_cholesky_size both terms and their gradients are exact
        (reference inv_quad_logdet Cholesky path, _linear_operator.py:
        1713-1731)."""
        K = _psd(self.key, n=18)
        b = jax.random.normal(jax.random.PRNGKey(3), (18, 2), dtype=jnp.float64)

        def f(K):
            iq, ld = inv_quad_logdet(DenseLinearOperator(K), b, logdet=True)
            return 2.0 * iq - 3.0 * ld

        def g(K):
            iq = jnp.sum(jnp.linalg.solve(K, b) * b)
            ld = jnp.linalg.slogdet(K)[1]
            return 2.0 * iq - 3.0 * ld

        self.assertAllClose(f(K), g(K), rtol=1e-8, atol=1e-8)
        self.assertAllClose(jax.grad(f)(K), jax.grad(g)(K), rtol=1e-6, atol=1e-8)

    def test_stochastic_logdet_gradient_unbiased(self):
        """The stochastic trace-estimator gradient (reference
        functions/_inv_quad_logdet.py:163-226) is unbiased:
        d/ds logdet(s K) = n / s, checked against the SLQ estimate."""
        n = 48
        K = _psd(self.key, n=n, cond=10.0)

        def f(s, key):
            with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
                 settings.max_cg_iterations(300), settings.num_trace_samples(256), \
                 settings.max_lanczos_quadrature_iterations(48), \
                 settings.min_preconditioning_size(10**9):
                _, ld = inv_quad_logdet(
                    DenseLinearOperator(s * K), logdet=True, key=key
                )
            return ld

        grads = [
            float(jax.grad(f)(1.7, jax.random.PRNGKey(k))) for k in range(4)
        ]
        self.assertAllClose(np.mean(grads), n / 1.7, rtol=0.05, atol=0.0)


class TestDiagonalization(BaseTestCase):
    def test_symeig_path_and_gradient(self):
        K = _psd(self.key, n=14, cond=40.0)
        evals, evecs = diagonalization(DenseLinearOperator(K), method="symeig")
        recon = (evecs.to_dense() * evals) @ evecs.to_dense().T
        self.assertAllClose(recon, K, rtol=1e-9, atol=1e-9)

        def f(K):
            evals, _ = diagonalization(DenseLinearOperator(K), method="symeig")
            return jnp.sum(evals**2)

        # d tr(K^2)/dK = 2K (sum of squared eigenvalues)
        self.assertAllClose(jax.grad(f)(K), 2.0 * K, rtol=1e-7, atol=1e-7)

    def test_lanczos_path_full_rank(self):
        K = _psd(self.key, n=12, cond=15.0)
        with settings.max_root_decomposition_size(12):
            evals, evecs = diagonalization(
                DenseLinearOperator(K), method="lanczos", key=jax.random.PRNGKey(0)
            )
        recon = (evecs.to_dense() * evals) @ jnp.swapaxes(evecs.to_dense(), -1, -2)
        self.assertAllClose(recon, K, rtol=1e-5, atol=1e-5)


class TestDsmm(BaseTestCase):
    def _interp(self):
        rows, grid, k = 6, 9, 2
        idx = jnp.asarray(
            [[0, 1], [2, 3], [3, 4], [5, 6], [6, 7], [7, 8]], jnp.int32
        )
        vals = (
            jnp.abs(jax.random.normal(self.key, (rows, k), dtype=jnp.float64)) + 0.1
        )
        return InterpolationMatrix(idx, vals, grid), rows, grid

    def _dense_w(self, W, rows, grid):
        out = jnp.zeros((rows, grid), dtype=W.values.dtype)
        r = jnp.broadcast_to(jnp.arange(rows)[:, None], W.indices.shape)
        return out.at[r, W.indices].add(W.values)

    def test_forward_matches_dense(self):
        W, rows, grid = self._interp()
        rhs = jax.random.normal(jax.random.PRNGKey(4), (grid, 3), dtype=jnp.float64)
        self.assertAllClose(
            dsmm(W, rhs), self._dense_w(W, rows, grid) @ rhs, rtol=1e-12, atol=1e-12
        )

    def test_gradients(self):
        W, rows, grid = self._interp()
        rhs = jax.random.normal(jax.random.PRNGKey(5), (grid, 2), dtype=jnp.float64)

        def f(vals, rhs):
            return jnp.sum(
                jnp.tanh(dsmm(InterpolationMatrix(W.indices, vals, grid), rhs))
            )

        def g(vals, rhs):
            dense = jnp.zeros((rows, grid), dtype=vals.dtype)
            r = jnp.broadcast_to(jnp.arange(rows)[:, None], W.indices.shape)
            dense = dense.at[r, W.indices].add(vals)
            return jnp.sum(jnp.tanh(dense @ rhs))

        ga = jax.grad(f, argnums=(0, 1))(W.values, rhs)
        ge = jax.grad(g, argnums=(0, 1))(W.values, rhs)
        self.assertAllClose(ga[0], ge[0], rtol=1e-10, atol=1e-12)
        self.assertAllClose(ga[1], ge[1], rtol=1e-10, atol=1e-12)


class TestSqrtMatmulCIQ(BaseTestCase):
    def test_matches_dense_sqrt(self):
        K = _psd(self.key, n=20, cond=25.0)
        b = jax.random.normal(jax.random.PRNGKey(6), (20, 2), dtype=jnp.float64)
        evals, q = jnp.linalg.eigh(K)
        expected = (q * jnp.sqrt(evals)) @ q.T @ b
        with settings.minres_tolerance(1e-10), settings.num_contour_quadrature(31):
            out = sqrt_matmul_ciq(DenseLinearOperator(K), b)
        self.assertAllClose(out, expected, rtol=1e-4, atol=1e-5)


class TestPivotedCholeskyFunction(BaseTestCase):
    def test_return_pivots_and_descent(self):
        K = _psd(self.key, n=16, cond=100.0)
        L, pivots = pivoted_cholesky(
            DenseLinearOperator(K), rank=16, error_tol=0.0, return_pivots=True
        )
        self.assertEqual(pivots.shape, (16,))
        # a full-rank run reconstructs K and visits every index exactly once
        self.assertAllClose(L @ L.T, K, rtol=1e-8, atol=1e-8)
        self.assertEqual(sorted(np.asarray(pivots).tolist()), list(range(16)))

    def test_gradient_finite_difference(self):
        K = _psd(self.key, n=10, cond=20.0)

        def f(K):
            L = pivoted_cholesky(DenseLinearOperator(K), rank=4, error_tol=0.0)
            return jnp.sum(L * jnp.cos(jnp.arange(40.0).reshape(10, 4)))

        g = jax.grad(f)(K)
        # central differences along a random symmetric direction
        kd = jax.random.normal(jax.random.PRNGKey(8), K.shape, dtype=jnp.float64)
        kd = (kd + kd.T) / 2.0
        eps = 1e-6
        fd = (f(K + eps * kd) - f(K - eps * kd)) / (2 * eps)
        self.assertAllClose(jnp.sum(g * kd), fd, rtol=1e-5, atol=1e-7)
