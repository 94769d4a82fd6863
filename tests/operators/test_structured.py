"""Golden tests for Toeplitz, Block, Cat, Masked, Permutation, Interpolated
(reference: test/operators/test_{toeplitz,block_diag,block_interleaved,cat,
masked,permutation,interpolated}_linear_operator.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu.operators import (
    BlockDiagLinearOperator,
    BlockInterleavedLinearOperator,
    CatLinearOperator,
    DenseLinearOperator,
    InterpolatedLinearOperator,
    MaskedLinearOperator,
    PermutationLinearOperator,
    ToeplitzLinearOperator,
    TransposePermutationLinearOperator,
    cat,
)
from linear_operator_tpu.test import (
    LinearOperatorTestCase,
    RectangularLinearOperatorTestCase,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _psd(key, *batch, n=5):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=jnp.float64)


def _toeplitz_dense(col):
    n = col.shape[-1]
    i = jnp.arange(n)
    return col[..., jnp.abs(i[:, None] - i[None, :])]


def _spd_toeplitz_column(n, dtype=jnp.float64):
    # exponentially decaying column -> strictly diagonally dominant SPD
    return 2.0 ** (-jnp.arange(n, dtype=dtype)) + jnp.where(
        jnp.arange(n) == 0, 1.0, 0.0
    )


class TestToeplitzLinearOperator(LinearOperatorTestCase):
    seed = 0

    def create_linear_op(self):
        return ToeplitzLinearOperator(_spd_toeplitz_column(8))

    def evaluate_linear_op(self, op):
        return _toeplitz_dense(op.column)


class TestToeplitzLinearOperatorBatch(LinearOperatorTestCase):
    seed = 1
    should_test_sample = False

    def create_linear_op(self):
        base = _spd_toeplitz_column(6)
        scale = jnp.asarray([1.0, 1.5, 2.0], dtype=jnp.float64)[:, None]
        return ToeplitzLinearOperator(base * scale)

    def evaluate_linear_op(self, op):
        return _toeplitz_dense(op.column)


class TestToeplitzFFTvsDense(BaseTestCase):
    def test_fft_matmul_matches(self):
        from linear_operator_tpu import settings

        col = jnp.abs(jax.random.normal(self.key, (32,), dtype=jnp.float64))
        col = col.at[0].add(10.0)
        op = ToeplitzLinearOperator(col)
        rhs = jax.random.normal(self.key, (32, 4), dtype=jnp.float64)
        with settings.use_toeplitz(True), settings.toeplitz_fft_min_size(0):
            fft_result = op @ rhs
        with settings.use_toeplitz(False):
            dense_result = op @ rhs
        self.assertAllClose(fft_result, dense_result, rtol=1e-10, atol=1e-10)

    def test_fft_matmul_grad(self):
        col = _spd_toeplitz_column(16)
        rhs = jax.random.normal(self.key, (16, 2), dtype=jnp.float64)

        def f(c):
            return jnp.sum(jnp.sin(ToeplitzLinearOperator(c) @ rhs))

        def g(c):
            return jnp.sum(jnp.sin(_toeplitz_dense(c) @ rhs))

        self.assertAllClose(jax.grad(f)(col), jax.grad(g)(col), rtol=1e-8, atol=1e-8)


class TestBlockDiag(LinearOperatorTestCase):
    seed = 2
    should_test_sample = False

    def create_linear_op(self):
        return BlockDiagLinearOperator(
            DenseLinearOperator(_psd(jax.random.PRNGKey(110), 3, n=4))
        )

    def evaluate_linear_op(self, op):
        blocks = op.base.tensor  # (3, 4, 4)
        return jax.scipy.linalg.block_diag(*[blocks[i] for i in range(3)])


class TestBlockDiagOfDiag(BaseTestCase):
    def test_constructor_shortcut(self):
        # Reference block_diag_linear_operator.py:20-35
        # (_MetaBlockDiagLinearOperator): BlockDiag of Diag blocks IS a Diag.
        from linear_operator_tpu.operators import DiagLinearOperator

        d = jax.random.uniform(self.key, (3, 4), dtype=jnp.float64) + 1.0
        op = BlockDiagLinearOperator(DiagLinearOperator(d))
        self.assertIsInstance(op, DiagLinearOperator)
        self.assertEqual(op.shape, (12, 12))
        self.assertAllClose(op.diagonal(), d.reshape(-1), rtol=1e-15, atol=0)
        # batched
        db = jax.random.uniform(self.key, (2, 3, 4), dtype=jnp.float64) + 1.0
        opb = BlockDiagLinearOperator(DiagLinearOperator(db))
        self.assertIsInstance(opb, DiagLinearOperator)
        self.assertEqual(opb.shape, (2, 12, 12))

    def test_diag_matmul_block_diag(self):
        # Reference diag_linear_operator.py:217-223: D @ blockdiag stays lazy
        # block-diagonal with scaled blocks.
        from linear_operator_tpu.operators import DiagLinearOperator

        blocks = _psd(jax.random.PRNGKey(112), 3, n=4)
        bd = BlockDiagLinearOperator(DenseLinearOperator(blocks))
        d = jax.random.uniform(self.key, (12,), dtype=jnp.float64) + 0.5
        out = DiagLinearOperator(d).matmul(bd)
        self.assertIsInstance(out, BlockDiagLinearOperator)
        expected = d[:, None] * bd.to_dense()
        self.assertAllClose(out.to_dense(), expected, rtol=1e-12, atol=1e-12)


class TestBlockInterleaved(BaseTestCase):
    def test_matmul_solve_logdet(self):
        blocks = _psd(jax.random.PRNGKey(111), 3, n=4)
        op = BlockInterleavedLinearOperator(DenseLinearOperator(blocks))
        # dense: entry (i*3+s, j*3+s') = blocks[s,i,j] delta(s,s')
        dense = jnp.einsum("knm,ks->nkms", blocks, jnp.eye(3)).reshape(12, 12)
        self.assertAllClose(op.to_dense(), dense, rtol=1e-12, atol=1e-12)
        rhs = jax.random.normal(self.key, (12, 2), dtype=jnp.float64)
        self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-10, atol=1e-10)
        self.assertAllClose(
            op.solve(rhs), jnp.linalg.solve(dense, rhs), rtol=1e-8, atol=1e-8
        )
        self.assertAllClose(
            op.logdet(), jnp.linalg.slogdet(dense)[1], rtol=1e-8, atol=1e-8
        )
        self.assertAllClose(op.diagonal(), jnp.diagonal(dense), rtol=1e-12, atol=1e-12)
        L = op.cholesky().to_dense()
        self.assertAllClose(L @ L.T, dense, rtol=1e-8, atol=1e-8)


class TestCat(BaseTestCase):
    def test_cat_rows_cols(self):
        a = jax.random.normal(jax.random.PRNGKey(112), (4, 6), dtype=jnp.float64)
        b = jax.random.normal(jax.random.PRNGKey(113), (3, 6), dtype=jnp.float64)
        rows = cat([DenseLinearOperator(a), DenseLinearOperator(b)], dim=-2)
        dense = jnp.concatenate([a, b], axis=0)
        self.assertEqual(rows.shape, (7, 6))
        rhs = jax.random.normal(self.key, (6, 2), dtype=jnp.float64)
        self.assertAllClose(rows @ rhs, dense @ rhs, rtol=1e-12, atol=1e-12)
        self.assertAllClose(rows.to_dense(), dense, rtol=1e-12, atol=1e-12)

        cols = cat(
            [DenseLinearOperator(a.T), DenseLinearOperator(b.T)], dim=-1
        )
        dense_c = jnp.concatenate([a.T, b.T], axis=1)
        rhs2 = jax.random.normal(self.key, (7, 2), dtype=jnp.float64)
        self.assertAllClose(cols @ rhs2, dense_c @ rhs2, rtol=1e-12, atol=1e-12)

        # transpose round trip
        self.assertAllClose(rows.mT.to_dense(), dense.T, rtol=1e-12, atol=1e-12)

    def test_cat_getitem_slices(self):
        a = jax.random.normal(jax.random.PRNGKey(114), (4, 5), dtype=jnp.float64)
        b = jax.random.normal(jax.random.PRNGKey(115), (3, 5), dtype=jnp.float64)
        rows = cat([DenseLinearOperator(a), DenseLinearOperator(b)], dim=-2)
        dense = jnp.concatenate([a, b], axis=0)
        sub = rows[2:6, :]
        self.assertAllClose(sub.to_dense(), dense[2:6], rtol=1e-12, atol=1e-12)


class TestMasked(RectangularLinearOperatorTestCase):
    seed = 3
    should_test_getitem_tensor_index = False

    def create_linear_op(self):
        base = DenseLinearOperator(_psd(jax.random.PRNGKey(116), n=8))
        row_mask = np.array([1, 0, 1, 1, 0, 1, 1, 0], bool)
        col_mask = np.array([1, 1, 0, 1, 0, 1, 0, 1], bool)
        return MaskedLinearOperator.from_masks(base, row_mask, col_mask)

    def evaluate_linear_op(self, op):
        dense = op.base.tensor
        return dense[op.row_idx][:, op.col_idx]


class TestPermutation(BaseTestCase):
    def test_matmul_solve(self):
        perm = jnp.asarray(np.random.RandomState(0).permutation(7))
        op = PermutationLinearOperator(perm)
        dense = jax.nn.one_hot(perm, 7, dtype=jnp.float32)
        rhs = jax.random.normal(self.key, (7, 2), dtype=jnp.float32)
        self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-6, atol=1e-6)
        x = op.solve(rhs)
        self.assertAllClose(dense @ x, rhs, rtol=1e-6, atol=1e-6)
        self.assertAllClose(op._logdet_structure(), 0.0, rtol=0, atol=0)
        self.assertAllClose(
            op.mT.to_dense(), dense.T, rtol=0, atol=0
        )

    def test_transpose_permutation(self):
        op = TransposePermutationLinearOperator.from_side(3)
        A = jax.random.normal(self.key, (3, 3), dtype=jnp.float32)
        vecA = A.reshape(-1)[:, None]
        out = (op @ vecA)[:, 0].reshape(3, 3)
        self.assertAllClose(out, A.T, rtol=1e-6, atol=1e-6)


class TestInterpolated(BaseTestCase):
    def _make(self):
        M, n, k = 10, 6, 2
        base = DenseLinearOperator(_psd(jax.random.PRNGKey(117), n=M, ))
        key = jax.random.PRNGKey(118)
        li = jax.random.randint(key, (n, k), 0, M)
        lv = jax.random.uniform(jax.random.PRNGKey(119), (n, k), dtype=jnp.float64)
        ri = jax.random.randint(jax.random.PRNGKey(120), (n, k), 0, M)
        rv = jax.random.uniform(jax.random.PRNGKey(121), (n, k), dtype=jnp.float64)
        op = InterpolatedLinearOperator(base, li, lv, ri, rv)
        wl = jnp.zeros((n, M), jnp.float64).at[jnp.arange(n)[:, None], li].add(lv)
        wr = jnp.zeros((n, M), jnp.float64).at[jnp.arange(n)[:, None], ri].add(rv)
        dense = wl @ base.tensor @ wr.T
        return op, dense

    def test_matmul(self):
        op, dense = self._make()
        rhs = jax.random.normal(self.key, (6, 3), dtype=jnp.float64)
        self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-10, atol=1e-10)
        self.assertAllClose(op.to_dense(), dense, rtol=1e-10, atol=1e-10)
        self.assertAllClose(op.diagonal(), jnp.diagonal(dense), rtol=1e-10, atol=1e-10)

    def test_t_matmul_and_grad(self):
        op, dense = self._make()
        rhs = jax.random.normal(self.key, (6, 2), dtype=jnp.float64)
        self.assertAllClose(op._t_matmul(rhs), dense.T @ rhs, rtol=1e-10, atol=1e-10)

        leaves, treedef = jax.tree_util.tree_flatten(op)

        def f(leaves_):
            o = jax.tree_util.tree_unflatten(treedef, leaves_)
            return jnp.sum((o @ rhs) ** 2)

        grads = jax.grad(f, allow_int=True)(leaves)
        for leaf, g in zip(leaves, grads):
            if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
                self.assertTrue(bool(jnp.all(jnp.isfinite(g))))


class TestToeplitzFFTCutoff(BaseTestCase):
    def test_small_toeplitz_uses_dense_mxu_path(self):
        """Below settings.toeplitz_fft_min_size the mat-vec must take the
        dense MXU path (TPU crossover; operators/toeplitz.py)."""
        from unittest import mock

        from linear_operator_tpu import settings
        import linear_operator_tpu.operators.toeplitz as tp_mod

        col = _spd_toeplitz_column(8)
        op = ToeplitzLinearOperator(col)
        rhs = jax.random.normal(self.key, (8, 2), dtype=col.dtype)
        with mock.patch.object(
            tp_mod, "toeplitz_matmul", wraps=tp_mod.toeplitz_matmul
        ) as fft_mock:
            with settings.toeplitz_fft_min_size(64):
                _ = op @ rhs
            self.assertFalse(fft_mock.called)
            with settings.toeplitz_fft_min_size(4):
                _ = op @ rhs
            self.assertTrue(fft_mock.called)
