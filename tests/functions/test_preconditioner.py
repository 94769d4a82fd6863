"""End-to-end tests of the pivoted-Cholesky CG preconditioner (reference:
added_diag_linear_operator.py:95-184 + test/operators/test_added_diag_linear_operator.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu import settings
from linear_operator_tpu.operators import (
    AddedDiagLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _lowrankish_psd(key, n, eff_rank=10):
    """A PSD matrix with rapidly decaying spectrum (preconditioner-friendly)."""
    a = jax.random.normal(key, (n, n), dtype=jnp.float64)
    q, _ = jnp.linalg.qr(a)
    evals = 100.0 * jnp.exp(-jnp.arange(n, dtype=jnp.float64) / eff_rank) + 1e-3
    return (q * evals) @ q.T


class TestPreconditioner(BaseTestCase):
    def _op(self, n=300):
        K = _lowrankish_psd(jax.random.PRNGKey(130), n)
        d = jnp.full((n,), 0.05, dtype=jnp.float64)
        op = AddedDiagLinearOperator(DenseLinearOperator(K), DiagLinearOperator(d))
        dense = K + jnp.diag(d)
        return op, dense

    def test_preconditioner_built_and_correct(self):
        op, dense = self._op()
        with settings.min_preconditioning_size(10), settings.max_preconditioner_size(25):
            closure, precond_op, logdet_p = op._preconditioner()
        self.assertIsNotNone(closure)
        # closure applies P^{-1} where P = L L^T + D
        P = precond_op.to_dense()
        v = jax.random.normal(self.key, (dense.shape[0], 2), dtype=jnp.float64)
        self.assertAllClose(closure(v), jnp.linalg.solve(P, v), rtol=1e-8, atol=1e-8)
        self.assertAllClose(
            logdet_p, jnp.linalg.slogdet(P)[1], rtol=1e-8, atol=1e-8
        )
        # P approximates K + D for a fast-decaying spectrum (rank-25 pivoted
        # Cholesky of an eff-rank-10 spectrum leaves a tail of a few percent)
        rel = jnp.linalg.norm(P - dense) / jnp.linalg.norm(dense)
        self.assertLess(float(rel), 0.3)

    def test_preconditioner_accelerates_cg(self):
        from linear_operator_tpu.solvers.linear_cg import linear_cg

        op, dense = self._op()
        b = jax.random.normal(self.key, (dense.shape[0], 1), dtype=jnp.float64)
        with settings.min_preconditioning_size(10), settings.max_preconditioner_size(25):
            closure, _, _ = op._preconditioner()
        plain = linear_cg(op._matmul, b, tolerance=1e-10, max_iter=400)
        pre = linear_cg(
            op._matmul, b, tolerance=1e-10, max_iter=400, preconditioner=closure
        )
        self.assertAllClose(
            pre.solution, jnp.linalg.solve(dense, b), rtol=1e-6, atol=1e-6
        )
        self.assertLess(int(pre.num_iters), int(plain.num_iters))

    def test_preconditioned_inv_quad_logdet(self):
        op, dense = self._op()
        b = jax.random.normal(self.key, (dense.shape[0], 1), dtype=jnp.float64)
        with settings.min_preconditioning_size(10), settings.max_preconditioner_size(25), \
             settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
             settings.max_cg_iterations(500), settings.num_trace_samples(64), \
             settings.max_lanczos_quadrature_iterations(40):
            iq, ld = op.inv_quad_logdet(b, logdet=True, key=self.key)
        iq_true = jnp.sum(jnp.linalg.solve(dense, b) * b)
        ld_true = jnp.linalg.slogdet(dense)[1]
        self.assertAllClose(iq, iq_true, rtol=1e-5, atol=1e-5)
        # variance-reduced: with a good preconditioner the estimate is tight
        # even at modest probe counts
        self.assertAllClose(ld, ld_true, rtol=0.02, atol=1.0)

    def test_preconditioned_solve_dispatch(self):
        op, dense = self._op()
        b = jax.random.normal(self.key, (dense.shape[0], 2), dtype=jnp.float64)
        with settings.min_preconditioning_size(10), settings.max_preconditioner_size(25), \
             settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
             settings.max_cg_iterations(500):
            x = op.solve(b)
        self.assertAllClose(x, jnp.linalg.solve(dense, b), rtol=1e-6, atol=1e-6)

    def test_preconditioned_gradients(self):
        n = 250
        K0 = _lowrankish_psd(jax.random.PRNGKey(131), n)
        b = jax.random.normal(self.key, (n, 1), dtype=jnp.float64)

        def f_lazy(s):
            op = AddedDiagLinearOperator(
                DenseLinearOperator(K0 * s),
                DiagLinearOperator(jnp.full((n,), 0.05, dtype=jnp.float64)),
            )
            with settings.min_preconditioning_size(10), settings.max_preconditioner_size(25), \
                 settings.max_cholesky_size(0), settings.cg_tolerance(1e-12), \
                 settings.max_cg_iterations(600), settings.num_trace_samples(256), \
                 settings.max_lanczos_quadrature_iterations(48):
                iq, ld = op.inv_quad_logdet(b, logdet=True, key=jax.random.PRNGKey(7))
            return iq + ld

        def f_dense(s):
            Km = K0 * s + 0.05 * jnp.eye(n, dtype=jnp.float64)
            return jnp.sum(jnp.linalg.solve(Km, b) * b) + jnp.linalg.slogdet(Km)[1]

        ga = jax.grad(f_lazy)(1.2)
        ge = jax.grad(f_dense)(1.2)
        self.assertAllClose(ga, ge, rtol=0.05, atol=0.2)


class TestNystromPreconditioner(BaseTestCase):
    """settings.preconditioner_mode("nystrom"): one-shot strided Nystrom
    factor instead of the sequential pivoted-Cholesky loop (TPU-native
    extension; operators/added_diag.py nystrom_factor)."""

    def test_nystrom_preconditioned_solve(self):
        n = 300
        K = _lowrankish_psd(jax.random.PRNGKey(140), n)
        d = jnp.full((n,), 0.05, dtype=jnp.float64)
        op = AddedDiagLinearOperator(DenseLinearOperator(K), DiagLinearOperator(d))
        dense = K + jnp.diag(d)
        b = jax.random.normal(self.key, (n, 2), dtype=jnp.float64)
        with settings.preconditioner_mode("nystrom"), \
             settings.min_preconditioning_size(10), \
             settings.max_preconditioner_size(40), \
             settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
             settings.max_cg_iterations(500):
            x = op.solve(b)
        self.assertAllClose(x, jnp.linalg.solve(dense, b), rtol=1e-6, atol=1e-6)

    def test_nystrom_closure_quality(self):
        """With rank >= effective rank, P^{-1} is a near-exact solve."""
        n = 250
        K = _lowrankish_psd(jax.random.PRNGKey(141), n, eff_rank=8)
        d = jnp.full((n,), 0.1, dtype=jnp.float64)
        op = AddedDiagLinearOperator(DenseLinearOperator(K), DiagLinearOperator(d))
        with settings.preconditioner_mode("nystrom"), \
             settings.min_preconditioning_size(10), \
             settings.max_preconditioner_size(60):
            closure, _, logdet_p = op._preconditioner()
        v = jax.random.normal(self.key, (n, 2), dtype=jnp.float64)
        exact = jnp.linalg.solve(K + jnp.diag(d), v)
        rel = jnp.linalg.norm(closure(v) - exact) / jnp.linalg.norm(exact)
        # strided landmarks on an incoherent (rotated) spectrum are a rough
        # approximation — the preconditioner only needs to be a contraction
        unprec = jnp.linalg.norm(v - exact) / jnp.linalg.norm(exact)
        self.assertLess(float(rel), 0.35)
        self.assertLess(float(rel), float(unprec))
