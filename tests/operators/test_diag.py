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


class TestConstantDiagLinearOperator(LinearOperatorTestCase):
    seed = 2
    should_call_cg = False
    should_call_lanczos = False

    def create_linear_op(self):
        c = jnp.abs(jax.random.normal(jax.random.PRNGKey(22), (3, 1), dtype=jnp.float64)) + 1.0
        return ConstantDiagLinearOperator(c, diag_shape=6)

    def evaluate_linear_op(self, op):
        return op.diag[..., :, None] * jnp.eye(op.diag_shape, dtype=op.diag.dtype)
