"""Golden tests for Root/LowRankRoot/Chol operators (reference:
test/operators/test_root_linear_operator.py, test_chol_linear_operator.py)."""

import jax
import jax.numpy as jnp

from linear_operator_tpu.operators import (
    CholLinearOperator,
    DenseLinearOperator,
    LowRankRootAddedDiagLinearOperator,
    LowRankRootLinearOperator,
    RootLinearOperator,
    TriangularLinearOperator,
)
from linear_operator_tpu.test import LinearOperatorTestCase


class TestRootLinearOperator(LinearOperatorTestCase):
    seed = 0

    def create_linear_op(self):
        r = jax.random.normal(jax.random.PRNGKey(40), (8, 8), dtype=jnp.float64)
        r = r + 4 * jnp.eye(8)  # full-rank so solves exist
        return RootLinearOperator(DenseLinearOperator(r))

    def evaluate_linear_op(self, op):
        r = op.root.tensor
        return r @ jnp.swapaxes(r, -1, -2)


class TestCholLinearOperator(LinearOperatorTestCase):
    seed = 1
    should_call_cg = False

    def create_linear_op(self):
        a = jax.random.normal(jax.random.PRNGKey(41), (2, 6, 6), dtype=jnp.float64)
        K = a @ jnp.swapaxes(a, -1, -2) + 6 * jnp.eye(6)
        L = jnp.linalg.cholesky(K)
        return CholLinearOperator(
            TriangularLinearOperator(DenseLinearOperator(L), upper=False)
        )

    def evaluate_linear_op(self, op):
        L = jnp.tril(op.root._tensor.tensor)
        return L @ jnp.swapaxes(L, -1, -2)

    def test_zero_mean_mvn_samples(self):
        pass  # batched

    def test_inverse(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        self.assertAllClose(
            op.inverse().to_dense(), jnp.linalg.inv(dense), rtol=1e-7, atol=1e-7
        )


class TestLowRankRootAddedDiag(LinearOperatorTestCase):
    """The Woodbury path — README 10M-demo structure (reference
    test/operators/test_low_rank_root_added_diag_linear_operator.py)."""

    seed = 2
    should_call_cg = False

    def create_linear_op(self):
        u = jax.random.normal(jax.random.PRNGKey(42), (10, 3), dtype=jnp.float64)
        d = jnp.abs(jax.random.normal(jax.random.PRNGKey(43), (10,), dtype=jnp.float64)) + 0.5
        return LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(d)

    def evaluate_linear_op(self, op):
        u = op.operators[0].root.tensor
        d = op.operators[1].diag
        return u @ jnp.swapaxes(u, -1, -2) + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(d)

    def test_type(self):
        self.assertIsInstance(self.create_linear_op(), LowRankRootAddedDiagLinearOperator)

    def test_exact_solve_and_logdet(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = jax.random.normal(self.key, (10, 2), dtype=jnp.float64)
        # structural (Woodbury) path must be exact regardless of settings
        self.assertAllClose(
            op._solve_structure(b), jnp.linalg.solve(dense, b), rtol=1e-9, atol=1e-9
        )
        self.assertAllClose(
            op._logdet_structure(), jnp.linalg.slogdet(dense)[1], rtol=1e-9, atol=1e-9
        )
