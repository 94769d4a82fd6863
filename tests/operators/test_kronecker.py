"""Golden tests for the Kronecker family (reference:
test/operators/test_kronecker_product_linear_operator.py and
test_kronecker_product_added_diag_linear_operator.py,
test_sum_kronecker_linear_operator.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu.operators import (
    ConstantDiagLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
    KroneckerProductAddedDiagLinearOperator,
    KroneckerProductDiagLinearOperator,
    KroneckerProductLinearOperator,
    SumKroneckerLinearOperator,
)
from linear_operator_tpu.test import LinearOperatorTestCase
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _psd(key, *batch, n=4):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=jnp.float64)


def _kron(a, b):
    return jnp.kron(a, b) if a.ndim == 2 else jax.vmap(jnp.kron)(a, b)


class TestKroneckerProduct(LinearOperatorTestCase):
    seed = 0
    should_test_sample = False

    def create_linear_op(self):
        return KroneckerProductLinearOperator(
            (
                DenseLinearOperator(_psd(jax.random.PRNGKey(90), n=3)),
                DenseLinearOperator(_psd(jax.random.PRNGKey(91), n=4)),
            )
        )

    def evaluate_linear_op(self, op):
        return _kron(op.operators[0].tensor, op.operators[1].tensor)


class TestKroneckerProductBatch(LinearOperatorTestCase):
    seed = 1
    should_test_sample = False

    def create_linear_op(self):
        return KroneckerProductLinearOperator(
            (
                DenseLinearOperator(_psd(jax.random.PRNGKey(92), 2, n=3)),
                DenseLinearOperator(_psd(jax.random.PRNGKey(93), 2, n=2)),
            )
        )

    def evaluate_linear_op(self, op):
        return _kron(op.operators[0].tensor, op.operators[1].tensor)


class TestKroneckerThreeFactor(BaseTestCase):
    def test_matmul_and_solve(self):
        ops = [
            DenseLinearOperator(_psd(jax.random.PRNGKey(94 + i), n=n))
            for i, n in enumerate((2, 3, 2))
        ]
        kp = KroneckerProductLinearOperator(tuple(ops))
        dense = jnp.kron(jnp.kron(ops[0].tensor, ops[1].tensor), ops[2].tensor)
        rhs = jax.random.normal(self.key, (12, 3), dtype=jnp.float64)
        self.assertAllClose(kp @ rhs, dense @ rhs, rtol=1e-9, atol=1e-9)
        self.assertAllClose(
            kp.solve(rhs), jnp.linalg.solve(dense, rhs), rtol=1e-7, atol=1e-7
        )
        self.assertAllClose(
            kp.logdet(), jnp.linalg.slogdet(dense)[1], rtol=1e-8, atol=1e-8
        )
        self.assertAllClose(kp.diagonal(), jnp.diagonal(dense), rtol=1e-9, atol=1e-9)


class TestKroneckerDiag(BaseTestCase):
    def test_closed_forms(self):
        d1 = jnp.abs(jax.random.normal(self.key, (3,), dtype=jnp.float64)) + 1
        d2 = jnp.abs(jax.random.normal(self.key, (4,), dtype=jnp.float64)) + 1
        kp = KroneckerProductDiagLinearOperator(
            (DiagLinearOperator(d1), DiagLinearOperator(d2))
        )
        dense_diag = jnp.kron(d1, d2)
        self.assertAllClose(kp.diagonal(), dense_diag, rtol=1e-12, atol=1e-12)
        rhs = jax.random.normal(self.key, (12, 2), dtype=jnp.float64)
        self.assertAllClose(kp.solve(rhs), rhs / dense_diag[:, None], rtol=1e-12, atol=1e-12)
        self.assertAllClose(
            kp._logdet_structure(), jnp.sum(jnp.log(dense_diag)), rtol=1e-12, atol=1e-12
        )
        inv = kp.inverse()
        self.assertAllClose(inv.diagonal(), 1 / dense_diag, rtol=1e-12, atol=1e-12)


class TestKroneckerAddedDiag(BaseTestCase):
    def test_constant_diag_exact(self):
        a = _psd(jax.random.PRNGKey(95), n=3)
        b = _psd(jax.random.PRNGKey(96), n=4)
        kp = KroneckerProductLinearOperator(
            (DenseLinearOperator(a), DenseLinearOperator(b))
        )
        op = kp + ConstantDiagLinearOperator(
            jnp.asarray([0.7], dtype=jnp.float64), diag_shape=12
        )
        self.assertIsInstance(op, KroneckerProductAddedDiagLinearOperator)
        dense = jnp.kron(a, b) + 0.7 * jnp.eye(12, dtype=jnp.float64)
        rhs = jax.random.normal(self.key, (12, 2), dtype=jnp.float64)
        self.assertAllClose(
            op._solve_structure(rhs), jnp.linalg.solve(dense, rhs), rtol=1e-8, atol=1e-8
        )
        self.assertAllClose(
            op._logdet_structure(), jnp.linalg.slogdet(dense)[1], rtol=1e-9, atol=1e-9
        )
        iq, ld = op.inv_quad_logdet(rhs, logdet=True)
        self.assertAllClose(
            iq, jnp.sum(jnp.linalg.solve(dense, rhs) * rhs), rtol=1e-8, atol=1e-8
        )
        root = op._root_structure().to_dense()
        self.assertAllClose(root @ root.T, dense, rtol=1e-8, atol=1e-8)

    def test_no_cholesky_used(self):
        # Reference test_kronecker_product_added_diag_linear_operator.py:
        # 140-158: solves and root_inv_decomposition route through the
        # Kronecker eigendecomposition, never through a dense Cholesky of
        # the full operator.
        from unittest import mock

        from linear_operator_tpu import settings

        a = _psd(jax.random.PRNGKey(99), n=3)
        b = _psd(jax.random.PRNGKey(94), n=4)
        kp = KroneckerProductLinearOperator(
            (DenseLinearOperator(a), DenseLinearOperator(b))
        )
        op = kp + ConstantDiagLinearOperator(
            jnp.asarray([0.7], dtype=jnp.float64), diag_shape=12
        )
        dense = jnp.kron(a, b) + 0.7 * jnp.eye(12, dtype=jnp.float64)
        rhs = jax.random.normal(self.key, (12, 5), dtype=jnp.float64)
        with mock.patch.object(
            type(op), "cholesky", side_effect=AssertionError("cholesky used")
        ), settings.max_cholesky_size(0):
            self.assertAllClose(
                op.solve(rhs), jnp.linalg.solve(dense, rhs), rtol=1e-8, atol=1e-8
            )
            root_inv = op.root_inv_decomposition()
            self.assertAllClose(
                root_inv @ rhs, jnp.linalg.solve(dense, rhs), rtol=1e-5, atol=1e-5
            )

    def test_hyperparameter_grads(self):
        a0 = _psd(jax.random.PRNGKey(97), n=3)
        b0 = _psd(jax.random.PRNGKey(98), n=3)
        rhs = jax.random.normal(self.key, (9, 1), dtype=jnp.float64)

        def f_lazy(s):
            kp = KroneckerProductLinearOperator(
                (DenseLinearOperator(a0 * s), DenseLinearOperator(b0))
            )
            op = kp + ConstantDiagLinearOperator(
                jnp.asarray([0.5], dtype=jnp.float64), diag_shape=9
            )
            iq, ld = op.inv_quad_logdet(rhs, logdet=True)
            return iq + ld

        def f_dense(s):
            K = jnp.kron(a0 * s, b0) + 0.5 * jnp.eye(9, dtype=jnp.float64)
            return jnp.sum(jnp.linalg.solve(K, rhs) * rhs) + jnp.linalg.slogdet(K)[1]

        ga = jax.grad(f_lazy)(1.3)
        ge = jax.grad(f_dense)(1.3)
        self.assertAllClose(ga, ge, rtol=1e-6, atol=1e-8)


class TestSumKronecker(BaseTestCase):
    def test_solve_logdet_root(self):
        a = _psd(jax.random.PRNGKey(100), n=3)
        b = _psd(jax.random.PRNGKey(101), n=4)
        c = _psd(jax.random.PRNGKey(102), n=3)
        d = _psd(jax.random.PRNGKey(103), n=4)
        op = SumKroneckerLinearOperator(
            (
                KroneckerProductLinearOperator(
                    (DenseLinearOperator(a), DenseLinearOperator(b))
                ),
                KroneckerProductLinearOperator(
                    (DenseLinearOperator(c), DenseLinearOperator(d))
                ),
            )
        )
        dense = jnp.kron(a, b) + jnp.kron(c, d)
        rhs = jax.random.normal(self.key, (12, 2), dtype=jnp.float64)
        self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-9, atol=1e-9)
        self.assertAllClose(
            op._solve_structure(rhs), jnp.linalg.solve(dense, rhs), rtol=1e-7, atol=1e-7
        )
        self.assertAllClose(
            op._logdet_structure(), jnp.linalg.slogdet(dense)[1], rtol=1e-8, atol=1e-8
        )
        root = op._root_structure().to_dense()
        self.assertAllClose(root @ root.T, dense, rtol=1e-7, atol=1e-7)

    def test_kp_plus_kp_dispatch(self):
        a = _psd(jax.random.PRNGKey(104), n=2)
        b = _psd(jax.random.PRNGKey(105), n=3)
        kp1 = KroneckerProductLinearOperator(
            (DenseLinearOperator(a), DenseLinearOperator(b))
        )
        kp2 = KroneckerProductLinearOperator(
            (DenseLinearOperator(a * 0.5), DenseLinearOperator(b * 2.0))
        )
        self.assertIsInstance(kp1 + kp2, SumKroneckerLinearOperator)


class TestKroneckerKronDiag(BaseTestCase):
    """Rakitsch-style exact solves for Kronecker-structured diagonals."""

    def test_kron_diag_exact(self):
        a = _psd(jax.random.PRNGKey(106), n=3)
        b = _psd(jax.random.PRNGKey(107), n=4)
        d1 = jnp.abs(jax.random.normal(jax.random.PRNGKey(108), (3,), dtype=jnp.float64)) + 0.5
        d2 = jnp.abs(jax.random.normal(jax.random.PRNGKey(109), (4,), dtype=jnp.float64)) + 0.5
        kp = KroneckerProductLinearOperator(
            (DenseLinearOperator(a), DenseLinearOperator(b))
        )
        kdiag = KroneckerProductDiagLinearOperator(
            (DiagLinearOperator(d1), DiagLinearOperator(d2))
        )
        op = kp + kdiag
        self.assertIsInstance(op, KroneckerProductAddedDiagLinearOperator)
        dense = jnp.kron(a, b) + jnp.diag(jnp.kron(d1, d2))
        rhs = jax.random.normal(self.key, (12, 2), dtype=jnp.float64)
        self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-10, atol=1e-10)
        self.assertAllClose(
            op._solve_structure(rhs), jnp.linalg.solve(dense, rhs), rtol=1e-8, atol=1e-8
        )
        self.assertAllClose(
            op._logdet_structure(), jnp.linalg.slogdet(dense)[1], rtol=1e-9, atol=1e-9
        )
        iq, ld = op.inv_quad_logdet(rhs, logdet=True)
        self.assertAllClose(
            iq, jnp.sum(jnp.linalg.solve(dense, rhs) * rhs), rtol=1e-8, atol=1e-8
        )
        self.assertAllClose(ld, jnp.linalg.slogdet(dense)[1], rtol=1e-9, atol=1e-9)

    def test_kron_diag_mismatched_factors_falls_back(self):
        """Same factor count but mismatched per-factor sizes: no whitening
        fast path exists, so the structure hooks must return None and the
        generic dispatch (Cholesky/CG) must produce the dense answer instead
        of crashing on the missing fast path."""
        from linear_operator_tpu import settings

        a = _psd(jax.random.PRNGKey(110), n=4)
        b = _psd(jax.random.PRNGKey(111), n=6)
        d1 = jnp.abs(jax.random.normal(jax.random.PRNGKey(112), (6,), dtype=jnp.float64)) + 0.5
        d2 = jnp.abs(jax.random.normal(jax.random.PRNGKey(113), (4,), dtype=jnp.float64)) + 0.5
        op = KroneckerProductLinearOperator(
            (DenseLinearOperator(a), DenseLinearOperator(b))
        ) + KroneckerProductDiagLinearOperator(
            (DiagLinearOperator(d1), DiagLinearOperator(d2))
        )
        self.assertIsInstance(op, KroneckerProductAddedDiagLinearOperator)
        self.assertFalse(op._whitening_shapes_match)
        dense = jnp.kron(a, b) + jnp.diag(jnp.kron(d1, d2))
        rhs = jax.random.normal(self.key, (24, 2), dtype=jnp.float64)
        # structure hooks: no fast path
        self.assertIsNone(op._solve_structure(rhs))
        self.assertIsNone(op._logdet_structure())
        self.assertIsNone(op._inv_quad_logdet_structure(rhs, True))
        # with_preconditioner is the path VERDICT advertises for this case
        op = op.with_preconditioner()
        # Cholesky dispatch (n=24 < max_cholesky_size)
        self.assertAllClose(
            op.solve(rhs), jnp.linalg.solve(dense, rhs), rtol=1e-8, atol=1e-8
        )
        iq, ld = op.inv_quad_logdet(rhs, logdet=True)
        self.assertAllClose(
            iq, jnp.sum(jnp.linalg.solve(dense, rhs) * rhs), rtol=1e-8, atol=1e-8
        )
        self.assertAllClose(ld, jnp.linalg.slogdet(dense)[1], rtol=1e-8, atol=1e-8)
        # CG dispatch (force the iterative path the hook falls back to)
        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-12), \
             settings.max_cg_iterations(200), settings.num_trace_samples(64):
            self.assertAllClose(
                op.solve(rhs), jnp.linalg.solve(dense, rhs), rtol=1e-6, atol=1e-6
            )
            iq, ld = op.inv_quad_logdet(
                rhs, logdet=True, key=jax.random.PRNGKey(3)
            )
        self.assertAllClose(
            iq, jnp.sum(jnp.linalg.solve(dense, rhs) * rhs), rtol=1e-5, atol=1e-5
        )
        self.assertAllClose(ld, jnp.linalg.slogdet(dense)[1], rtol=0.25, atol=0.5)
