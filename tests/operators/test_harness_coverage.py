"""Full golden harness for operators that previously had only spot tests:
Interpolated, Cat, Permutation, BlockInterleaved, SumKronecker,
KroneckerProductAddedDiag, Zero, Masked-PSD (VERDICT r1 weak item 3).

Reference model: test/operators/test_*_linear_operator.py — every operator
gets create/evaluate + the inherited ~55 property tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu.operators import (
    BlockInterleavedLinearOperator,
    CatLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
    KroneckerProductAddedDiagLinearOperator,
    KroneckerProductLinearOperator,
    MaskedLinearOperator,
    PermutationLinearOperator,
    SumKroneckerLinearOperator,
    TransposePermutationLinearOperator,
    ZeroLinearOperator,
)
from linear_operator_tpu.operators.interpolated import InterpolatedLinearOperator
from linear_operator_tpu.test import (
    LinearOperatorTestCase,
    RectangularLinearOperatorTestCase,
)


def _psd(key, *batch, n=6):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=jnp.float64)


def _interp_dense(indices, values, rows, grid):
    # traceable (used inside the harness's grad checks)
    w = jnp.zeros((rows, grid), values.dtype)
    row_ids = jnp.broadcast_to(jnp.arange(rows)[:, None], indices.shape)
    return w.at[row_ids, indices].add(values)


class TestInterpolatedLinearOperator(LinearOperatorTestCase):
    seed = 0
    # W K W^T is PSD but rank-deficient-ish; keep solve paths on tight ops
    should_call_lanczos = True

    def create_linear_op(self):
        grid, n, k = 8, 6, 2
        base = DenseLinearOperator(_psd(jax.random.PRNGKey(10), n=grid))
        li = jnp.asarray([[0, 1], [1, 2], [2, 3], [4, 5], [5, 6], [6, 7]], jnp.int32)
        lv = (
            jnp.abs(jax.random.normal(jax.random.PRNGKey(11), (n, k), dtype=jnp.float64))
            + 0.5
        )
        return InterpolatedLinearOperator(base, li, lv, li, lv).add_jitter(1.0)

    def evaluate_linear_op(self, op):
        interp = op.operators[0] if hasattr(op, "operators") else op
        base = interp.base.to_dense()
        wl = _interp_dense(interp.left_indices, interp.left_values, 6, 8)
        wr = _interp_dense(interp.right_indices, interp.right_values, 6, 8)
        dense = wl @ base @ wr.T
        # jitter term from the op's own leaf so gradients match
        return dense + jnp.diag(op.operators[1]._diagonal())


class TestInterpolatedLinearOperatorBatch(LinearOperatorTestCase):
    """Batched interp arrays + batched base: the round-4 `_interp_to_dense`
    scatter bug (batched indices added into every batch slice) lived below
    the unbatched-only harness class above."""

    seed = 3
    should_call_lanczos = True

    def create_linear_op(self):
        grid, n, k, B = 8, 6, 2, 3
        base = DenseLinearOperator(_psd(jax.random.PRNGKey(30), B, n=grid))
        li = jax.random.randint(jax.random.PRNGKey(31), (B, n, k), 0, grid - 1)
        li = jnp.concatenate([li[..., :1], li[..., :1] + 1], axis=-1)
        lv = (
            jnp.abs(
                jax.random.normal(
                    jax.random.PRNGKey(32), (B, n, k), dtype=jnp.float64
                )
            )
            + 0.5
        )
        return InterpolatedLinearOperator(base, li, lv, li, lv).add_jitter(1.0)

    def evaluate_linear_op(self, op):
        interp = op.operators[0] if hasattr(op, "operators") else op
        base = interp.base.to_dense()
        wl = jnp.stack(
            [
                _interp_dense(interp.left_indices[b], interp.left_values[b], 6, 8)
                for b in range(3)
            ]
        )
        wr = jnp.stack(
            [
                _interp_dense(interp.right_indices[b], interp.right_values[b], 6, 8)
                for b in range(3)
            ]
        )
        dense = wl @ base @ jnp.swapaxes(wr, -1, -2)
        return dense + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(
            op.operators[1]._diagonal()
        )


class TestCatLinearOperatorPSD(LinearOperatorTestCase):
    seed = 1
    should_test_getitem_tensor_index = True

    def create_linear_op(self):
        full = _psd(jax.random.PRNGKey(20), n=7)
        k11 = DenseLinearOperator(full[:4, :4])
        k12 = DenseLinearOperator(full[:4, 4:])
        k21 = DenseLinearOperator(full[4:, :4])
        k22 = DenseLinearOperator(full[4:, 4:])
        top = CatLinearOperator((k11, k12), cat_dim=-1)
        bottom = CatLinearOperator((k21, k22), cat_dim=-1)
        return CatLinearOperator((top, bottom), cat_dim=-2)

    def evaluate_linear_op(self, op):
        top, bottom = op.operators
        return jnp.concatenate(
            [
                jnp.concatenate([b.to_dense() for b in top.operators], axis=-1),
                jnp.concatenate([b.to_dense() for b in bottom.operators], axis=-1),
            ],
            axis=-2,
        )


class TestCatLinearOperatorRows(RectangularLinearOperatorTestCase):
    seed = 2

    def create_linear_op(self):
        a = jax.random.normal(jax.random.PRNGKey(21), (3, 6), dtype=jnp.float64)
        b = jax.random.normal(jax.random.PRNGKey(22), (4, 6), dtype=jnp.float64)
        return CatLinearOperator(
            (DenseLinearOperator(a), DenseLinearOperator(b)), cat_dim=-2
        )

    def evaluate_linear_op(self, op):
        return jnp.concatenate([o.to_dense() for o in op.operators], axis=-2)


class TestPermutationLinearOperator(RectangularLinearOperatorTestCase):
    seed = 3

    def create_linear_op(self):
        perm = jnp.asarray([3, 0, 4, 1, 2], jnp.int32)
        return PermutationLinearOperator(perm)

    def evaluate_linear_op(self, op):
        n = op.shape[-1]
        return jnp.eye(n, dtype=op.dtype)[op.perm]


class TestTransposePermutationLinearOperator(RectangularLinearOperatorTestCase):
    seed = 4

    def create_linear_op(self):
        # vec-transpose permutation for 2x2 matrices (a symmetric involution,
        # reference permutation_linear_operator.py:152-199)
        return TransposePermutationLinearOperator.from_side(2)

    def evaluate_linear_op(self, op):
        n = op.shape[-1]
        return jnp.eye(n, dtype=op.dtype)[op.perm]


class TestBlockInterleavedLinearOperator(LinearOperatorTestCase):
    seed = 5

    def create_linear_op(self):
        base = DenseLinearOperator(_psd(jax.random.PRNGKey(30), 3, n=4))
        return BlockInterleavedLinearOperator(base)

    def evaluate_linear_op(self, op):
        blocks = op.base.to_dense()  # (3, 4, 4)
        k, n = blocks.shape[-3], blocks.shape[-1]
        dense = jnp.zeros((k * n, k * n), dtype=blocks.dtype)
        for b in range(k):
            for i in range(n):
                for j in range(n):
                    dense = dense.at[i * k + b, j * k + b].set(blocks[b, i, j])
        return dense


class TestSumKroneckerLinearOperator(LinearOperatorTestCase):
    seed = 6

    def create_linear_op(self):
        A = DenseLinearOperator(_psd(jax.random.PRNGKey(40), n=3))
        B = DenseLinearOperator(_psd(jax.random.PRNGKey(41), n=2))
        C = DenseLinearOperator(_psd(jax.random.PRNGKey(42), n=3))
        D = DenseLinearOperator(_psd(jax.random.PRNGKey(43), n=2))
        return SumKroneckerLinearOperator(
            (
                KroneckerProductLinearOperator((A, B)),
                KroneckerProductLinearOperator((C, D)),
            )
        )

    def evaluate_linear_op(self, op):
        kp1, kp2 = op.operators
        k1 = jnp.kron(kp1.operators[0].to_dense(), kp1.operators[1].to_dense())
        k2 = jnp.kron(kp2.operators[0].to_dense(), kp2.operators[1].to_dense())
        return k1 + k2


class TestKroneckerProductAddedDiagLinearOperator(LinearOperatorTestCase):
    seed = 7

    def create_linear_op(self):
        k1 = DenseLinearOperator(_psd(jax.random.PRNGKey(50), n=3))
        k2 = DenseLinearOperator(_psd(jax.random.PRNGKey(51), n=3))
        kron = KroneckerProductLinearOperator((k1, k2))
        diag = DiagLinearOperator(
            jnp.abs(jax.random.normal(jax.random.PRNGKey(52), (9,), dtype=jnp.float64))
            + 0.5
        )
        return KroneckerProductAddedDiagLinearOperator(kron, diag)

    def evaluate_linear_op(self, op):
        kron = op.operators[0]
        k = jnp.kron(kron.operators[0].to_dense(), kron.operators[1].to_dense())
        return k + jnp.diag(op.operators[1]._diagonal())


class TestZeroLinearOperator(RectangularLinearOperatorTestCase):
    seed = 8

    def create_linear_op(self):
        return ZeroLinearOperator(shape_=(5, 4), dtype_="float64")

    def evaluate_linear_op(self, op):
        return jnp.zeros((5, 4), dtype=jnp.float64)


class TestMaskedLinearOperatorPSD(LinearOperatorTestCase):
    seed = 9

    def create_linear_op(self):
        base = DenseLinearOperator(_psd(jax.random.PRNGKey(60), n=9))
        idx = jnp.asarray([0, 2, 3, 5, 7, 8], jnp.int32)
        return MaskedLinearOperator(base, idx, idx)

    def evaluate_linear_op(self, op):
        dense = op.base.to_dense()
        r = np.asarray(op.row_idx)
        c = np.asarray(op.col_idx)
        return dense[np.ix_(r, c)]
