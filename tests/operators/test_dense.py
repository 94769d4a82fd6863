"""Golden tests for DenseLinearOperator (reference:
test/operators/test_dense_linear_operator.py)."""

import jax
import jax.numpy as jnp

from linear_operator_tpu.operators import DenseLinearOperator
from linear_operator_tpu.test import LinearOperatorTestCase, RectangularLinearOperatorTestCase


def _psd(key, *batch, n=8, dtype=jnp.float64):
    a = jax.random.normal(key, (*batch, n, n), dtype=dtype)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=dtype)


class TestDenseLinearOperator(LinearOperatorTestCase):
    seed = 0

    def create_linear_op(self):
        return DenseLinearOperator(_psd(jax.random.PRNGKey(10)))

    def evaluate_linear_op(self, op):
        return op.tensor


class TestDenseLinearOperatorBatch(LinearOperatorTestCase):
    seed = 1

    def create_linear_op(self):
        return DenseLinearOperator(_psd(jax.random.PRNGKey(11), 3))

    def evaluate_linear_op(self, op):
        return op.tensor


class TestDenseLinearOperatorMultiBatch(LinearOperatorTestCase):
    seed = 2
    should_test_sample = False

    def create_linear_op(self):
        return DenseLinearOperator(_psd(jax.random.PRNGKey(12), 2, 3, n=6))

    def evaluate_linear_op(self, op):
        return op.tensor


class TestDenseLinearOperatorRectangular(RectangularLinearOperatorTestCase):
    seed = 3

    def create_linear_op(self):
        return DenseLinearOperator(
            jax.random.normal(jax.random.PRNGKey(13), (7, 5), dtype=jnp.float64)
        )

    def evaluate_linear_op(self, op):
        return op.tensor
