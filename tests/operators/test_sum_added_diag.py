"""Golden tests for Sum / AddedDiag operators (reference:
test/operators/test_sum_linear_operator.py, test_added_diag_linear_operator.py)."""

import jax
import jax.numpy as jnp

from linear_operator_tpu.operators import (
    AddedDiagLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
    SumLinearOperator,
)
from linear_operator_tpu.test import LinearOperatorTestCase


def _psd(key, *batch, n=7):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=jnp.float64)


class TestSumLinearOperator(LinearOperatorTestCase):
    seed = 0

    def create_linear_op(self):
        return SumLinearOperator(
            (
                DenseLinearOperator(_psd(jax.random.PRNGKey(50))),
                DenseLinearOperator(_psd(jax.random.PRNGKey(51))),
            )
        )

    def evaluate_linear_op(self, op):
        return op.operators[0].tensor + op.operators[1].tensor


class TestAddedDiagLinearOperator(LinearOperatorTestCase):
    seed = 1

    def create_linear_op(self):
        d = jnp.abs(jax.random.normal(jax.random.PRNGKey(52), (7,), dtype=jnp.float64)) + 0.5
        return AddedDiagLinearOperator(
            DenseLinearOperator(_psd(jax.random.PRNGKey(53))), DiagLinearOperator(d)
        )

    def evaluate_linear_op(self, op):
        return op.operators[0].tensor + jnp.diag(op.operators[1].diag)

    def test_add_diag_folds(self):
        op = self.create_linear_op()
        res = op + DiagLinearOperator(jnp.ones(7, dtype=jnp.float64))
        self.assertIsInstance(res, AddedDiagLinearOperator)
        self.assertAllClose(
            res.to_dense(), self.evaluate_linear_op(op) + jnp.eye(7), rtol=1e-9, atol=1e-9
        )


class TestAddedDiagLinearOperatorBatch(LinearOperatorTestCase):
    seed = 2
    should_test_sample = False

    def create_linear_op(self):
        d = jnp.abs(jax.random.normal(jax.random.PRNGKey(54), (3, 7), dtype=jnp.float64)) + 0.5
        return AddedDiagLinearOperator(
            DenseLinearOperator(_psd(jax.random.PRNGKey(55), 3)), DiagLinearOperator(d)
        )

    def evaluate_linear_op(self, op):
        return op.operators[0].tensor + jnp.vectorize(
            jnp.diag, signature="(n)->(n,n)"
        )(op.operators[1].diag)
