"""Tests for stable QR/pinverse, permutation utils, default preconditioner
(reference: test/utils/test_qr.py, test_pinverse.py, test_permutation.py)."""

import jax
import jax.numpy as jnp

from linear_operator_tpu import beta_features, settings
from linear_operator_tpu.operators import DenseLinearOperator
from linear_operator_tpu.test.base_test_case import BaseTestCase
from linear_operator_tpu.utils.permutation import apply_permutation, inverse_permutation
from linear_operator_tpu.utils.qr import stable_pinverse, stable_qr


class TestStableQR(BaseTestCase):
    def test_qr_reconstructs(self):
        a = jax.random.normal(self.key, (3, 10, 6), dtype=jnp.float64)
        q, r = stable_qr(a)
        self.assertAllClose(q @ r, a, rtol=1e-10, atol=1e-10)
        self.assertAllClose(
            jnp.swapaxes(q, -1, -2) @ q,
            jnp.broadcast_to(jnp.eye(6), (3, 6, 6)),
            rtol=1e-10,
            atol=1e-10,
        )

    def test_pinverse_tall(self):
        a = jax.random.normal(self.key, (12, 5), dtype=jnp.float64)
        p = stable_pinverse(a)
        self.assertAllClose(p @ a, jnp.eye(5), rtol=1e-9, atol=1e-9)

    def test_pinverse_wide(self):
        a = jax.random.normal(self.key, (5, 12), dtype=jnp.float64)
        p = stable_pinverse(a)
        self.assertAllClose(a @ p, jnp.eye(5), rtol=1e-9, atol=1e-9)


class TestPermutationUtils(BaseTestCase):
    def test_apply_and_invert(self):
        import numpy as np

        perm = jnp.asarray(np.random.RandomState(1).permutation(8))
        m = jax.random.normal(self.key, (8, 8), dtype=jnp.float64)
        out = apply_permutation(m, perm, perm)
        self.assertAllClose(out, m[perm][:, perm], rtol=0, atol=0)
        inv = inverse_permutation(perm)
        self.assertAllClose(perm[inv], jnp.arange(8), rtol=0, atol=0)

    def test_partial_left(self):
        m = jax.random.normal(self.key, (6, 6), dtype=jnp.float64)
        sel = jnp.asarray([4, 1, 3])
        out = apply_permutation(m, sel)
        self.assertAllClose(out, m[sel], rtol=0, atol=0)


class TestDefaultPreconditioner(BaseTestCase):
    def test_rangefinder_preconditioner(self):
        n = 150
        a = jax.random.normal(self.key, (n, n), dtype=jnp.float64)
        q, _ = jnp.linalg.qr(a)
        evals = 50.0 * jnp.exp(-jnp.arange(n) / 5.0) + 0.1
        K = (q * evals) @ q.T
        op = DenseLinearOperator(K)
        with beta_features.default_preconditioner(True), \
             settings.min_preconditioning_size(10), settings.max_preconditioner_size(30):
            closure, precond_op, logdet_p = op._preconditioner()
        self.assertIsNotNone(closure)
        P = precond_op.to_dense()
        v = jax.random.normal(self.key, (n, 2), dtype=jnp.float64)
        self.assertAllClose(closure(v), jnp.linalg.solve(P, v), rtol=1e-8, atol=1e-8)
        # preconditioned CG beats plain CG
        from linear_operator_tpu.solvers.linear_cg import linear_cg

        b = jax.random.normal(self.key, (n, 1), dtype=jnp.float64)
        plain = linear_cg(op._matmul, b, tolerance=1e-10, max_iter=300)
        pre = linear_cg(op._matmul, b, tolerance=1e-10, max_iter=300, preconditioner=closure)
        self.assertLess(int(pre.num_iters), int(plain.num_iters))


class TestBlockedCholesky(BaseTestCase):
    """blocked_cholesky matches jnp.linalg.cholesky (the TPU fast path for
    large n; utils/cholesky.py blocked right-looking sweep)."""

    def _check(self, shape, block, dtype=jnp.float64):
        from linear_operator_tpu.utils.cholesky import blocked_cholesky

        x = jax.random.normal(self.key, shape, dtype=dtype)
        n = shape[-1]
        a = x @ jnp.swapaxes(x, -1, -2) + 2.0 * n * jnp.eye(n, dtype=dtype)
        l_ref = jnp.linalg.cholesky(a)
        l_blk = blocked_cholesky(a, block=block)
        self.assertAllClose(l_blk, l_ref, rtol=1e-8, atol=1e-8)

    def test_divisible(self):
        self._check((2, 96, 96), block=32)

    def test_non_divisible_pads(self):
        self._check((80, 80), block=32)

    def test_small_passthrough(self):
        self._check((3, 16, 16), block=32)

    def test_nan_propagates_for_non_psd(self):
        from linear_operator_tpu.utils.cholesky import blocked_cholesky

        a = -jnp.eye(64, dtype=jnp.float64)
        l = blocked_cholesky(a, block=32)
        self.assertTrue(bool(jnp.any(jnp.isnan(l))))

    def test_jit_and_grad(self):
        from linear_operator_tpu.utils.cholesky import blocked_cholesky

        # Gradients agree through any SYMMETRIC construction of A (the
        # cotangent-on-A conventions differ in how they weight the unused
        # upper triangle, but pull back identically through symmetric maps).
        x = jax.random.normal(self.key, (48, 48), dtype=jnp.float64)

        def f_blk(x):
            a = x @ x.T + 96.0 * jnp.eye(48, dtype=jnp.float64)
            return jnp.sum(blocked_cholesky(a, block=16))

        def f_ref(x):
            a = x @ x.T + 96.0 * jnp.eye(48, dtype=jnp.float64)
            return jnp.sum(jnp.linalg.cholesky(a))

        self.assertAllClose(
            jax.jit(jax.grad(f_blk))(x), jax.grad(f_ref)(x), rtol=1e-7, atol=1e-7
        )
