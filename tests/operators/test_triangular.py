"""Golden tests for TriangularLinearOperator (reference:
test/operators/test_triangular_linear_operator.py)."""

import jax
import jax.numpy as jnp

from linear_operator_tpu.operators import DenseLinearOperator, TriangularLinearOperator
from linear_operator_tpu.test import RectangularLinearOperatorTestCase
from linear_operator_tpu.utils.errors import NotPSDError


def _tril(key, *batch, n=6):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return jnp.tril(a) + 2 * jnp.eye(n, dtype=jnp.float64)


class TestTriangularLinearOperator(RectangularLinearOperatorTestCase):
    seed = 0

    def create_linear_op(self):
        return TriangularLinearOperator(
            DenseLinearOperator(_tril(jax.random.PRNGKey(30))), upper=False
        )

    def evaluate_linear_op(self, op):
        return jnp.tril(op._tensor.tensor)

    def test_solve(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = jax.random.normal(self.key, (op.shape[-1], 3), dtype=jnp.float64)
        self.assertAllClose(op.solve(b), jnp.linalg.solve(dense, b), rtol=1e-8, atol=1e-8)

    def test_solve_grad(self):
        op = self.create_linear_op()
        b = jax.random.normal(self.key, (op.shape[-1], 3), dtype=jnp.float64)
        self._grad_check(
            op,
            lambda o: jnp.sum(jnp.sin(o.solve(b))),
            lambda d: jnp.sum(jnp.sin(jnp.linalg.solve(d, b))),
            name="tri_solve",
        )

    def test_inverse(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        self.assertAllClose(
            op.inverse().to_dense(), jnp.linalg.inv(dense), rtol=1e-8, atol=1e-8
        )

    def test_logdet_structure(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        self.assertAllClose(
            op._logdet_structure(),
            jnp.linalg.slogdet(dense)[1],
            rtol=1e-8,
            atol=1e-8,
        )

    def test_cholesky_raises(self):
        op = self.create_linear_op()
        with self.assertRaises(NotPSDError):
            op.cholesky()


class TestTriangularLinearOperatorUpperBatch(RectangularLinearOperatorTestCase):
    seed = 1

    def create_linear_op(self):
        a = jax.random.normal(jax.random.PRNGKey(31), (3, 6, 6), dtype=jnp.float64)
        t = jnp.triu(a) + 2 * jnp.eye(6, dtype=jnp.float64)
        return TriangularLinearOperator(DenseLinearOperator(t), upper=True)

    def evaluate_linear_op(self, op):
        return jnp.triu(op._tensor.tensor)

    def test_solve(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = jax.random.normal(self.key, (3, 6, 2), dtype=jnp.float64)
        self.assertAllClose(op.solve(b), jnp.linalg.solve(dense, b), rtol=1e-8, atol=1e-8)
