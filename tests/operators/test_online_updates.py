"""Tests for online updates: add_low_rank root concat + cat_rows fantasy
updates (reference: _linear_operator.py:1019-1142, 1152-1308 +
linear_operator_test_case.py:974-1050)."""

import jax
import jax.numpy as jnp

from linear_operator_tpu import settings
from linear_operator_tpu.operators import (
    CholLinearOperator,
    DenseLinearOperator,
    RootLinearOperator,
    TriangularLinearOperator,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _psd(key, n=10):
    a = jax.random.normal(key, (n, n), dtype=jnp.float64)
    return a @ a.T + n * jnp.eye(n, dtype=jnp.float64)


class TestAddLowRank(BaseTestCase):
    def test_root_concat_exact(self):
        K = _psd(jax.random.PRNGKey(140))
        L = jnp.linalg.cholesky(K)
        op = CholLinearOperator(
            TriangularLinearOperator(DenseLinearOperator(L), upper=False)
        )
        v = jax.random.normal(self.key, (10, 2), dtype=jnp.float64)
        updated = op.add_low_rank(v, generate_roots=True)
        self.assertIsInstance(updated, RootLinearOperator)
        expected = K + v @ v.T
        self.assertAllClose(updated.to_dense(), expected, rtol=1e-10, atol=1e-10)
        # the carried root is immediately usable for solves (no refactorize)
        b = jax.random.normal(self.key, (10, 1), dtype=jnp.float64)
        self.assertAllClose(
            updated.solve(b), jnp.linalg.solve(expected, b), rtol=1e-8, atol=1e-8
        )

    def test_lazy_sum_default(self):
        K = _psd(jax.random.PRNGKey(141))
        op = DenseLinearOperator(K)
        v = jax.random.normal(self.key, (10, 3), dtype=jnp.float64)
        updated = op.add_low_rank(v)
        self.assertAllClose(
            updated.to_dense(), K + v @ v.T, rtol=1e-10, atol=1e-10
        )

    def test_no_root_computation_when_no_roots(self):
        # Reference regression (test_dense_linear_operator.py:
        # test_no_root_computation_when_no_cached_roots): add_low_rank /
        # cat_rows with the default generate_roots=True must NOT compute a
        # root decomposition when the base operator doesn't already carry
        # one — speculative roots caused SVD failures on ill-conditioned
        # matrices.
        from unittest import mock

        from linear_operator_tpu.operators._linear_operator import LinearOperator
        from linear_operator_tpu.operators import SumLinearOperator

        K = _psd(jax.random.PRNGKey(142))
        op = DenseLinearOperator(K)
        v = jax.random.normal(self.key, (10, 2), dtype=jnp.float64)
        with mock.patch.object(
            LinearOperator,
            "root_decomposition",
            side_effect=AssertionError("speculative root computation"),
        ):
            updated = op.add_low_rank(v)
            self.assertIsInstance(updated, SumLinearOperator)
            appended = op.cat_rows(v.T, v.T @ jnp.linalg.solve(K, v) + jnp.eye(2))
            self.assertNotIsInstance(appended, RootLinearOperator)


class TestCatRows(BaseTestCase):
    def test_root_update_exact(self):
        n, m = 12, 3
        K = _psd(jax.random.PRNGKey(142), n=n + m)
        K11, K12, K22 = K[:n, :n], K[:n, n:], K[n:, n:]
        L = jnp.linalg.cholesky(K11)
        op = CholLinearOperator(
            TriangularLinearOperator(DenseLinearOperator(L), upper=False)
        )
        joined = op.cat_rows(K12.T, K22)
        self.assertIsInstance(joined, RootLinearOperator)
        self.assertAllClose(joined.to_dense(), K, rtol=1e-9, atol=1e-9)
        b = jax.random.normal(self.key, (n + m, 1), dtype=jnp.float64)
        self.assertAllClose(
            joined.solve(b), jnp.linalg.solve(K, b), rtol=1e-7, atol=1e-7
        )
        self.assertAllClose(
            joined.logdet(), jnp.linalg.slogdet(K)[1], rtol=1e-7, atol=1e-7
        )

    def test_lazy_block_cat(self):
        n, m = 8, 2
        K = _psd(jax.random.PRNGKey(143), n=n + m)
        op = DenseLinearOperator(K[:n, :n])
        joined = op.cat_rows(K[n:, :n], K[n:, n:], generate_roots=False)
        self.assertEqual(joined.shape, (n + m, n + m))
        self.assertAllClose(joined.to_dense(), K, rtol=1e-12, atol=1e-12)
        rhs = jax.random.normal(self.key, (n + m, 2), dtype=jnp.float64)
        self.assertAllClose(joined @ rhs, K @ rhs, rtol=1e-10, atol=1e-10)


class TestSkipLogdetForward(BaseTestCase):
    def test_zero_forward_live_gradient(self):
        n = 50
        K0 = _psd(jax.random.PRNGKey(144), n=n)

        def f(s, skip):
            op = DenseLinearOperator(K0 * s)
            ctx = settings.skip_logdet_forward(skip)
            with ctx, settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
                 settings.num_trace_samples(64), settings.max_cg_iterations(200):
                _, ld = op.inv_quad_logdet(None, logdet=True, key=jax.random.PRNGKey(5))
            return ld

        ld_on = f(1.0, True)
        self.assertAllClose(ld_on, 0.0, rtol=0, atol=1e-12)
        g_on = jax.grad(lambda s: f(s, True))(1.0)
        g_off = jax.grad(lambda s: f(s, False))(1.0)
        self.assertAllClose(g_on, g_off, rtol=1e-10, atol=1e-10)

    def test_preconditioned_forward_is_logdet_p(self):
        # Reference parity: with skip_logdet_forward on, the forward logdet is
        # logdet_p — the preconditioner's logdet is still added
        # (_linear_operator.py:1799-1800); only the SLQ term is skipped.
        from linear_operator_tpu.operators import AddedDiagLinearOperator, DiagLinearOperator

        n = 60
        K0 = _psd(jax.random.PRNGKey(145), n=n)
        d = jnp.full((n,), 0.5, dtype=jnp.float64)

        def ld_of(skip):
            op = AddedDiagLinearOperator(DenseLinearOperator(K0), DiagLinearOperator(d))
            with settings.skip_logdet_forward(skip), settings.max_cholesky_size(0), \
                 settings.cg_tolerance(1e-10), settings.num_trace_samples(32), \
                 settings.min_preconditioning_size(0), settings.max_preconditioner_size(10), \
                 settings.max_cg_iterations(200):
                if skip is None:
                    _, _, logdet_p = op.detach()._preconditioner()
                    return logdet_p
                _, ld = op.inv_quad_logdet(None, logdet=True, key=jax.random.PRNGKey(6))
                return ld

        logdet_p = ld_of(None)
        self.assertNotAlmostEqual(float(logdet_p), 0.0)  # preconditioner active
        self.assertAllClose(ld_of(True), logdet_p, rtol=1e-12, atol=1e-12)
        # And the full (skip off) estimate differs from logdet_p by the SLQ term.
        self.assertGreater(abs(float(ld_of(False) - logdet_p)), 1e-3)
