"""Golden tests for Diag/ConstantDiag operators (reference:
test/operators/test_diag_linear_operator.py)."""

import jax
import jax.numpy as jnp

from linear_operator_tpu.operators import (
    ConstantDiagLinearOperator,
    DiagLinearOperator,
)
from linear_operator_tpu.test import LinearOperatorTestCase


class TestDiagLinearOperator(LinearOperatorTestCase):
    seed = 0
    should_call_cg = False
    should_call_lanczos = False

    def create_linear_op(self):
        d = jnp.abs(jax.random.normal(jax.random.PRNGKey(20), (8,), dtype=jnp.float64)) + 1.0
        return DiagLinearOperator(d)

    def evaluate_linear_op(self, op):
        return op.diag[..., :, None] * jnp.eye(op.diag.shape[-1], dtype=op.diag.dtype)


class TestDiagLinearOperatorBatch(LinearOperatorTestCase):
    seed = 1
    should_call_cg = False
    should_call_lanczos = False

    def create_linear_op(self):
        d = jnp.abs(jax.random.normal(jax.random.PRNGKey(21), (2, 3, 6), dtype=jnp.float64)) + 1.0
        return DiagLinearOperator(d)

    def evaluate_linear_op(self, op):
        return op.diag[..., :, None] * jnp.eye(op.diag.shape[-1], dtype=op.diag.dtype)

    def test_zero_mean_mvn_samples(self):
        pass  # batched


class TestDiagSolveTriangular(LinearOperatorTestCase):
    """Reference test/operators/test_diag_linear_operator.py:83-97 and
    test_identity_linear_operator.py:171+: a diagonal operator solves
    triangular systems for either orientation; unitriangular treats the
    diagonal as ones (rejected when it concretely isn't)."""

    seed = 3
    should_call_cg = False
    should_call_lanczos = False

    def create_linear_op(self):
        d = jnp.abs(jax.random.normal(jax.random.PRNGKey(23), (5,), dtype=jnp.float64)) + 1.0
        return DiagLinearOperator(d)

    def evaluate_linear_op(self, op):
        return op.diag[..., :, None] * jnp.eye(op.diag.shape[-1], dtype=op.diag.dtype)

    def test_solve_triangular(self):
        op = self.create_linear_op()
        rhs = jax.random.normal(jax.random.PRNGKey(30), (5,), dtype=jnp.float64)
        for upper in (False, True):
            self.assertAllClose(
                op.solve_triangular(rhs, upper=upper),
                rhs / op.diagonal(),
                rtol=1e-14,
                atol=0,
            )
        mat = jax.random.normal(jax.random.PRNGKey(31), (5, 2), dtype=jnp.float64)
        self.assertAllClose(
            op.solve_triangular(mat, upper=False),
            mat / op.diagonal()[:, None],
            rtol=1e-14,
            atol=0,
        )
        # right-solve: x @ D = rhs
        matr = jax.random.normal(jax.random.PRNGKey(32), (2, 5), dtype=jnp.float64)
        self.assertAllClose(
            op.solve_triangular(matr, upper=False, left=False),
            matr / op.diagonal()[None, :],
            rtol=1e-14,
            atol=0,
        )
        # unitriangular: rejected for a non-unit diagonal...
        with self.assertRaises(RuntimeError):
            op.solve_triangular(rhs, upper=False, unitriangular=True)
        # ...identity mapping for a unit one
        ones = DiagLinearOperator(jnp.ones(5, dtype=jnp.float64))
        self.assertAllClose(
            ones.solve_triangular(rhs, upper=False, unitriangular=True),
            rhs,
            rtol=0,
            atol=0,
        )
        from linear_operator_tpu.operators import IdentityLinearOperator

        eye = IdentityLinearOperator(diag_shape=5, dtype_="float64")
        self.assertAllClose(
            eye.solve_triangular(rhs, upper=True), rhs, rtol=0, atol=0
        )


class TestConstantDiagLinearOperator(LinearOperatorTestCase):
    seed = 2
    should_call_cg = False
    should_call_lanczos = False

    def create_linear_op(self):
        c = jnp.abs(jax.random.normal(jax.random.PRNGKey(22), (3, 1), dtype=jnp.float64)) + 1.0
        return ConstantDiagLinearOperator(c, diag_shape=6)

    def evaluate_linear_op(self, op):
        return op.diag[..., :, None] * jnp.eye(op.diag_shape, dtype=op.diag.dtype)
