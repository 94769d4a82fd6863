"""Unit tests for the CG kernel (reference: test/utils/test_linear_cg.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu.solvers.linear_cg import linear_cg
from linear_operator_tpu.test.base_test_case import BaseTestCase


class TestLinearCG(BaseTestCase):
    def _make(self, key, *batch, n=64, cond=100.0):
        a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
        q, _ = jnp.linalg.qr(a)
        evals = jnp.logspace(0, np.log10(cond), n, dtype=jnp.float64)
        return (q * evals) @ jnp.swapaxes(q, -1, -2)

    def test_cg_solve(self):
        K = self._make(self.key)
        b = jax.random.normal(self.key, (64, 4), dtype=jnp.float64)
        res = jax.jit(
            lambda K, b: linear_cg(lambda v: K @ v, b, tolerance=1e-10, max_iter=200)
        )(K, b)
        self.assertAllClose(res.solution, jnp.linalg.solve(K, b), rtol=1e-6, atol=1e-6)

    def test_cg_batch(self):
        K = self._make(self.key, 3, n=32)
        b = jax.random.normal(self.key, (3, 32, 2), dtype=jnp.float64)
        res = jax.jit(
            lambda K, b: linear_cg(lambda v: K @ v, b, tolerance=1e-10, max_iter=200)
        )(K, b)
        self.assertAllClose(res.solution, jnp.linalg.solve(K, b), rtol=1e-6, atol=1e-6)

    def test_cg_vec(self):
        K = self._make(self.key, n=32)
        b = jax.random.normal(self.key, (32,), dtype=jnp.float64)
        res = jax.jit(
            lambda K, b: linear_cg(lambda v: K @ v, b, tolerance=1e-10, max_iter=200)
        )(K, b)
        self.assertEqual(res.solution.shape, (32,))
        self.assertAllClose(res.solution, jnp.linalg.solve(K, b), rtol=1e-6, atol=1e-6)

    def test_cg_with_preconditioner(self):
        K = self._make(self.key, n=64, cond=1e4)
        d = jnp.diagonal(K)
        b = jax.random.normal(self.key, (64, 2), dtype=jnp.float64)
        res_pc = jax.jit(
            lambda K, b: linear_cg(
                lambda v: K @ v,
                b,
                tolerance=1e-10,
                max_iter=500,
                preconditioner=lambda v: v / d[:, None],
            )
        )(K, b)
        self.assertAllClose(res_pc.solution, jnp.linalg.solve(K, b), rtol=1e-5, atol=1e-5)

    def test_initial_guess(self):
        # Reference test/utils/test_linear_cg.py::test_batch_cg_init: CG
        # warm-started from an initial guess converges to the same solution,
        # and an exact warm start stays at the solution.
        key = jax.random.PRNGKey(11)
        A = self._make(key, 2, n=32, cond=50.0)
        rhs = jax.random.normal(jax.random.PRNGKey(12), (2, 32, 3), dtype=jnp.float64)
        x_true = jnp.linalg.solve(A, rhs)
        x0 = x_true + 0.1 * jax.random.normal(jax.random.PRNGKey(13), x_true.shape, dtype=jnp.float64)
        res = linear_cg(
            lambda v: A @ v, rhs, max_iter=200, tolerance=1e-10, initial_guess=x0
        )
        self.assertAllClose(res.solution, x_true, rtol=1e-8, atol=1e-8)
        # exact warm start: residual already ~0, solution unchanged
        res2 = linear_cg(
            lambda v: A @ v, rhs, max_iter=5, tolerance=1e-10, initial_guess=x_true
        )
        self.assertAllClose(res2.solution, x_true, rtol=1e-9, atol=1e-9)

    def test_tridiag_ritz_values(self):
        """The extracted tridiagonal's Ritz values approximate K's spectrum
        (reference test_linear_cg.py lanczos consistency checks)."""
        K = self._make(self.key, n=48, cond=50.0)
        b = jax.random.normal(self.key, (48, 3), dtype=jnp.float64)
        res = jax.jit(
            lambda K, b: linear_cg(
                lambda v: K @ v,
                b,
                tolerance=1e-10,
                max_iter=200,
                n_tridiag=3,
                max_tridiag_iter=48,
            )
        )(K, b)
        self.assertEqual(res.t_mats.shape, (3, 48, 48))
        ritz = jnp.linalg.eigvalsh(res.t_mats)
        evals = jnp.linalg.eigvalsh(K)
        # extreme Ritz values converge to extreme eigenvalues
        self.assertAllClose(ritz[:, -1], jnp.full((3,), evals[-1]), rtol=1e-3, atol=1e-3)

    def test_zero_rhs_column(self):
        K = self._make(self.key, n=16)
        b = jnp.zeros((16, 2), dtype=jnp.float64)
        res = jax.jit(
            lambda K, b: linear_cg(lambda v: K @ v, b, tolerance=1e-10, max_iter=50)
        )(K, b)
        self.assertAllClose(res.solution, jnp.zeros((16, 2)), rtol=0, atol=0)

    def test_bf16_matvec_f32_recurrence(self):
        K = self._make(self.key, n=32, cond=10.0).astype(jnp.bfloat16)
        b = jax.random.normal(self.key, (32, 2), dtype=jnp.bfloat16)
        res = jax.jit(
            lambda K, b: linear_cg(lambda v: K @ v, b, tolerance=1e-3, max_iter=100)
        )(K, b)
        self.assertEqual(res.solution.dtype, jnp.bfloat16)
        x64 = jnp.linalg.solve(K.astype(jnp.float64), b.astype(jnp.float64))
        self.assertAllClose(res.solution.astype(jnp.float64), x64, rtol=0.15, atol=0.15)


class TestCGEarlyExitAllFrozen(BaseTestCase):
    """Round-4 review fix: when every column is below stop_updating_after,
    CG exits without burning min_iter masked mat-vecs (the reference skips
    the loop outright for this case, linear_cg.py:205-207)."""

    def test_zero_rhs_runs_zero_iterations(self):
        from linear_operator_tpu.solvers.linear_cg import linear_cg

        calls = {"n": 0}
        K = jnp.eye(8, dtype=jnp.float64)

        def mm(v):
            calls["n"] += 1
            return K @ v

        res = linear_cg(mm, jnp.zeros((8, 2), jnp.float64), max_iter=50)
        self.assertAllClose(res.solution, jnp.zeros((8, 2)), rtol=0, atol=0)
        # mm traced at most a few times for setup; the while_loop body
        # renders as one traced call regardless of trip count, so instead
        # assert via iteration counter
        self.assertEqual(int(res.num_iters), 0)

    def test_tridiag_still_runs_min_iters(self):
        from linear_operator_tpu.solvers.linear_cg import linear_cg

        a = jax.random.normal(self.key, (16, 16), jnp.float64)
        K = a @ a.T + 8 * jnp.eye(16)
        res = linear_cg(
            lambda v: K @ v,
            jnp.zeros((16, 2), jnp.float64),
            n_tridiag=1,
            max_iter=50,
            max_tridiag_iter=12,
        )
        self.assertGreaterEqual(int(res.num_iters), 12)
