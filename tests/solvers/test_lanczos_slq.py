"""Unit tests for Lanczos, SLQ and pivoted Cholesky kernels (reference:
test/utils/test_lanczos.py, test_pivoted_cholesky.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu.operators import DenseLinearOperator
from linear_operator_tpu.solvers.lanczos import lanczos_tridiag, lanczos_tridiag_to_diag
from linear_operator_tpu.solvers.pivoted_cholesky import pivoted_cholesky
from linear_operator_tpu.solvers.stochastic_lq import slq_quadrature
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _psd(key, *batch, n=32, cond=100.0):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    q, _ = jnp.linalg.qr(a)
    evals = jnp.logspace(0, np.log10(cond), n, dtype=jnp.float64)
    return (q * evals) @ jnp.swapaxes(q, -1, -2)


class TestLanczos(BaseTestCase):
    def test_full_rank_recovers_matrix(self):
        K = _psd(self.key, n=24)
        v = jax.random.normal(self.key, (24,), dtype=jnp.float64)
        Q, T = jax.jit(
            lambda K, v: lanczos_tridiag(lambda x: K @ x, 24, init_vecs=v)
        )(K, v)
        self.assertAllClose(Q @ T @ Q.T, K, rtol=1e-6, atol=1e-6)
        self.assertAllClose(Q.T @ Q, jnp.eye(24), rtol=1e-6, atol=1e-6)

    def test_batched(self):
        K = _psd(self.key, 3, n=16)
        v = jax.random.normal(self.key, (3, 16), dtype=jnp.float64)
        Q, T = jax.jit(
            lambda K, v: lanczos_tridiag(lambda x: K @ x, 16, init_vecs=v)
        )(K, v)
        self.assertAllClose(Q @ T @ jnp.swapaxes(Q, -1, -2), K, rtol=1e-6, atol=1e-6)

    def test_eigh_clamps(self):
        T = jnp.asarray([[1.0, 0.0], [0.0, -2.0]])
        evals, evecs = lanczos_tridiag_to_diag(T)
        self.assertTrue((evals >= 0).all())

    def test_breakdown(self):
        """Low-rank + identity: Lanczos finds the invariant subspace early
        and must not blow up after breakdown."""
        u = jax.random.normal(self.key, (20, 2), dtype=jnp.float64)
        K = u @ u.T + jnp.eye(20)
        v = jax.random.normal(self.key, (20,), dtype=jnp.float64)
        Q, T = jax.jit(
            lambda K, v: lanczos_tridiag(lambda x: K @ x, 20, init_vecs=v)
        )(K, v)
        self.assertFalse(bool(jnp.any(jnp.isnan(T))))
        self.assertFalse(bool(jnp.any(jnp.isnan(Q))))


class TestSLQ(BaseTestCase):
    def test_logdet_estimate(self):
        n = 100
        K = _psd(self.key, n=n, cond=50.0)
        m = 64
        probes = jax.random.normal(self.key, (n, m), dtype=jnp.float64)
        probes = probes / jnp.linalg.norm(probes, axis=0, keepdims=True)

        def run(K, probes):
            from linear_operator_tpu.solvers.linear_cg import linear_cg

            res = linear_cg(
                lambda v: K @ v,
                probes,
                tolerance=1e-10,
                max_iter=150,
                n_tridiag=m,
                max_tridiag_iter=48,
            )
            evals, evecs = lanczos_tridiag_to_diag(res.t_mats)
            (ld,) = slq_quadrature(n, evals, evecs, [jnp.log])
            return ld

        ld = jax.jit(run)(K, probes)
        ld_true = jnp.linalg.slogdet(K)[1]
        self.assertAllClose(ld, ld_true, rtol=0.05, atol=1.0)


class TestPivotedCholesky(BaseTestCase):
    def test_full_rank_exact(self):
        K = _psd(self.key, n=20, cond=25.0)
        op = DenseLinearOperator(K)
        L = jax.jit(lambda: pivoted_cholesky(op, 20, error_tol=0.0))()
        self.assertAllClose(L @ L.T, K, rtol=1e-6, atol=1e-6)

    def test_low_rank_approx(self):
        u = jax.random.normal(self.key, (50, 4), dtype=jnp.float64)
        K = u @ u.T + 1e-3 * jnp.eye(50)
        op = DenseLinearOperator(K)
        L = jax.jit(lambda: pivoted_cholesky(op, 6, error_tol=0.0))()
        self.assertEqual(L.shape, (50, 6))
        self.assertAllClose(L @ L.T, K, rtol=1e-2, atol=1e-2)

    def test_batched(self):
        K = _psd(self.key, 3, n=12, cond=10.0)
        op = DenseLinearOperator(K)
        L = jax.jit(lambda: pivoted_cholesky(op, 12, error_tol=0.0))()
        self.assertAllClose(L @ jnp.swapaxes(L, -1, -2), K, rtol=1e-6, atol=1e-6)

    def test_grad_flows(self):
        K = _psd(self.key, n=10, cond=10.0)

        def f(K):
            L = pivoted_cholesky(DenseLinearOperator(K), 10, error_tol=0.0)
            return jnp.sum(L**2)  # = trace(K) when factorization is exact

        g = jax.grad(f)(K)
        # d trace(K)/dK = I
        self.assertAllClose(g, jnp.eye(10), rtol=1e-4, atol=1e-4)


class TestBlockedPivotedCholesky(BaseTestCase):
    """Blocked greedy variant (solvers/pivoted_cholesky.py
    _blocked_pivoted_cholesky; settings.pivoted_cholesky_block_size)."""

    def test_full_rank_exact(self):
        K = _psd(self.key, n=24, cond=25.0)
        op = DenseLinearOperator(K)
        L = jax.jit(lambda: pivoted_cholesky(op, 24, error_tol=0.0, block_size=8))()
        self.assertAllClose(L @ L.T, K, rtol=1e-5, atol=1e-5)

    def test_quality_matches_strict_greedy(self):
        # kernel-like PSD matrix with decaying spectrum: blocked trace error
        # at the same rank must be within 1.5x of strict greedy
        x = jnp.linspace(0.0, 4.0, 160, dtype=jnp.float64)[:, None]
        K = jnp.exp(-0.5 * (x - x.T) ** 2) + 1e-8 * jnp.eye(160)
        op = DenseLinearOperator(K)
        strict = pivoted_cholesky(op, 24, error_tol=0.0)
        blocked = pivoted_cholesky(op, 24, error_tol=0.0, block_size=8)
        err_s = jnp.trace(K - strict @ strict.T)
        err_b = jnp.trace(K - blocked @ blocked.T)
        self.assertGreaterEqual(float(err_b), -1e-8)
        self.assertLessEqual(float(err_b), 1.5 * float(err_s) + 1e-10)

    def test_batched_and_setting(self):
        from linear_operator_tpu import settings

        K = _psd(self.key, 3, n=16, cond=10.0)
        op = DenseLinearOperator(K)
        with settings.pivoted_cholesky_block_size(4):
            L = jax.jit(lambda: pivoted_cholesky(op, 16, error_tol=0.0))()
        self.assertAllClose(L @ jnp.swapaxes(L, -1, -2), K, rtol=1e-5, atol=1e-5)

    def test_f32_late_sweep_stability(self):
        """Regression: late sweeps must take the in-pool residual diagonal
        from the FRESH panel Gram, not the incrementally tracked d — f32
        cancellation pushes the two apart and a stale dp > 0 over a
        near-zero fresh Gram diagonal NaN'd the triangular solve
        (solvers/pivoted_cholesky.py _blocked_pivoted_cholesky)."""
        from linear_operator_tpu.operators.kernel import rbf_kernel_operator
        from linear_operator_tpu.solvers.pivoted_cholesky import (
            _blocked_pivoted_cholesky,
        )

        x = jax.random.uniform(self.key, (4000, 3), dtype=jnp.float32)
        K = rbf_kernel_operator(x, lengthscale=0.5, outputscale=1.0)
        L = jax.jit(
            lambda: _blocked_pivoted_cholesky(K, 200, 0.0, 128, threshold=0.1)
        )()
        self.assertTrue(bool(jnp.all(jnp.isfinite(L))))
        # trace of K - L L^T must be tiny and non-negative-ish at rank 200
        resid = float(4000.0 - jnp.sum(L * L))
        self.assertLess(abs(resid), 4000.0 * 1e-2)

    def test_low_rank_degenerate_block(self):
        # rank-2 matrix factored with rank 8, block 4: degenerate pivots in
        # a block must yield zero columns, not NaNs
        u = jax.random.normal(self.key, (40, 2), dtype=jnp.float64)
        K = u @ u.T
        op = DenseLinearOperator(K)
        L = pivoted_cholesky(op, 8, error_tol=0.0, block_size=4)
        self.assertTrue(bool(jnp.all(jnp.isfinite(L))))
        self.assertAllClose(L @ L.T, K, rtol=1e-4, atol=1e-4)


class TestLanczosSmallScale(BaseTestCase):
    """Round-4 review fix: the breakdown threshold is scale-relative — an
    absolute 1e-5 killed the recurrence after 2 steps on a well-conditioned
    operator scaled by 1e-5 (small-outputscale kernels during hyperparameter
    optimization)."""

    def test_tiny_scale_full_accuracy(self):
        from linear_operator_tpu.solvers.lanczos import lanczos_tridiag

        a = jax.random.normal(self.key, (50, 50), jnp.float64)
        K = (a @ a.T + 10 * jnp.eye(50)) * 1e-5
        v = jax.random.normal(self.key, (50,), jnp.float64)
        Q, T = lanczos_tridiag(lambda x: K @ x, 20, init_vecs=v)
        rel = jnp.linalg.norm(Q.T @ K @ Q - T) / jnp.linalg.norm(T)
        self.assertLess(float(rel), 1e-10)
        # T's spectrum stays inside the true hull (no identity pollution)
        self.assertLessEqual(
            float(jnp.linalg.eigvalsh(T).max()),
            float(jnp.linalg.eigvalsh(K).max()) * (1 + 1e-10),
        )

    def test_breakdown_pads_stay_in_hull(self):
        from linear_operator_tpu.solvers.lanczos import lanczos_tridiag

        u = jax.random.normal(self.key, (50, 3), jnp.float64)
        K = u @ u.T  # rank 3: true breakdown at step 3
        v = jax.random.normal(self.key, (50,), jnp.float64)
        Q, T = lanczos_tridiag(lambda x: K @ x, 10, init_vecs=v)
        self.assertLessEqual(
            float(jnp.linalg.eigvalsh(T).max()),
            float(jnp.linalg.eigvalsh(K).max()) * (1 + 1e-10),
        )
        # dead Lanczos columns are exactly zero
        self.assertEqual(float(jnp.abs(Q[:, 4:]).max()), 0.0)


class TestBlockedPivCholConvergence(BaseTestCase):
    """Round-4 review fix: the blocked sweep's accept threshold compares
    fresh-vs-fresh residual diagonals (stale tracked d could reject every
    candidate near convergence, no-op'ing every remaining sweep)."""

    def test_f32_smooth_kernel_near_full_depletion(self):
        import numpy as np

        x = jnp.asarray(np.linspace(0, 4, 300), jnp.float32)
        K = jnp.exp(-0.5 * (x[:, None] - x[None, :]) ** 2) + 1e-4 * jnp.eye(
            300, dtype=jnp.float32
        )
        op = DenseLinearOperator(K)
        # rank far beyond the numerical rank of a smooth RBF: late sweeps
        # operate in the f32 cancellation regime the fix targets
        L = pivoted_cholesky(op, rank=120, error_tol=0.0, block_size=16)
        err = jnp.abs(L @ L.T - K).max()
        self.assertLess(float(err), 5e-3)
        strict = pivoted_cholesky(op, rank=120, error_tol=0.0)
        err_strict = jnp.abs(strict @ strict.T - K).max()
        # blocked quality within 10x of strict greedy at matched rank
        self.assertLess(float(err), max(10 * float(err_strict), 1e-3))
