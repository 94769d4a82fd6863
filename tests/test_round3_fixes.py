"""Round-3 correctness fixes from the deep package review: Chol principal
submatrices, ConstantMul with (1,1)-trailing constants, batched Cat
diagonals, BatchRepeat solve fallback, CIQ inverse=False, key hygiene."""

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu import settings
from linear_operator_tpu.operators import (
    BatchRepeatLinearOperator,
    CatLinearOperator,
    ConstantMulLinearOperator,
    DenseLinearOperator,
    RootLinearOperator,
)
from linear_operator_tpu.functions import solve


def _psd(key, n, batch=()):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=jnp.float64)


class TestCholGetitemSlice:
    def test_principal_submatrix_of_chol(self):
        """chol[0:3, 0:3] must not crash on the Chol constructor's
        triangular-root invariant: the sliced factor is lower-trapezoidal,
        so the result degrades to a plain Root with exact values."""
        from linear_operator_tpu.operators import CholLinearOperator

        k = _psd(jax.random.PRNGKey(0), 6)
        op = DenseLinearOperator(k).root_decomposition(method="cholesky")
        assert isinstance(op, CholLinearOperator)
        sub = op[0:3, 0:3]
        assert isinstance(sub, RootLinearOperator)
        np.testing.assert_allclose(sub.to_dense(), k[0:3, 0:3], rtol=1e-12)

    def test_low_rank_root_slice_keeps_type(self):
        from linear_operator_tpu.operators import LowRankRootLinearOperator

        u = jax.random.normal(jax.random.PRNGKey(1), (8, 3), dtype=jnp.float64)
        op = LowRankRootLinearOperator(u)
        sub = op[1:5, 1:5]
        assert isinstance(sub, LowRankRootLinearOperator)
        np.testing.assert_allclose(
            sub.to_dense(), (u @ u.T)[1:5, 1:5], rtol=1e-12
        )


class TestConstantMulTrailingOnes:
    def test_unbatched_11_constant(self):
        k = _psd(jax.random.PRNGKey(2), 6)
        op = DenseLinearOperator(k).mul(jnp.full((1, 1), 2.0))
        assert op.shape == (6, 6)
        np.testing.assert_allclose(op.to_dense(), 2.0 * k, rtol=1e-12)

    def test_batched_b11_constant(self):
        k = _psd(jax.random.PRNGKey(3), 6, batch=(2,))
        c = jnp.array([2.0, 3.0]).reshape(2, 1, 1)
        op = DenseLinearOperator(k).mul(c)
        assert op.shape == (2, 6, 6)
        np.testing.assert_allclose(
            op.to_dense(), c * k, rtol=1e-12
        )
        # per-batch constants must align with the batch dim in solves too
        rhs = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 2), dtype=jnp.float64)
        np.testing.assert_allclose(
            op.solve(rhs), jnp.linalg.solve(c * k, rhs), rtol=1e-8
        )


class TestCatBatchedDiagonal:
    def test_diagonal_batched_blocks_rows(self):
        a = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 6), dtype=jnp.float64)
        b = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 6), dtype=jnp.float64)
        op = CatLinearOperator(
            (DenseLinearOperator(a), DenseLinearOperator(b)), cat_dim=-2
        )
        dense = jnp.concatenate([a, b], axis=-2)
        assert op.shape == (2, 6, 6)
        np.testing.assert_allclose(
            op.diagonal(),
            jnp.diagonal(dense, axis1=-2, axis2=-1),
            rtol=1e-12,
        )

    def test_diagonal_batched_blocks_cols(self):
        a = jax.random.normal(jax.random.PRNGKey(7), (2, 6, 3), dtype=jnp.float64)
        b = jax.random.normal(jax.random.PRNGKey(8), (2, 6, 3), dtype=jnp.float64)
        op = CatLinearOperator(
            (DenseLinearOperator(a), DenseLinearOperator(b)), cat_dim=-1
        )
        dense = jnp.concatenate([a, b], axis=-1)
        np.testing.assert_allclose(
            op.diagonal(),
            jnp.diagonal(dense, axis1=-2, axis2=-1),
            rtol=1e-12,
        )


class TestBatchRepeatSolveFallback:
    def test_base_structure_hook_returns_none(self):
        """ConstantMul over a dense base overrides _solve_structure but
        returns None at runtime — BatchRepeat must fall back to the generic
        dispatch instead of crashing in its reshape plumbing."""
        k = _psd(jax.random.PRNGKey(9), 5)
        base = ConstantMulLinearOperator(DenseLinearOperator(k), jnp.asarray(2.0))
        op = BatchRepeatLinearOperator(base, batch_repeat=(3,))
        rhs = jax.random.normal(jax.random.PRNGKey(10), (3, 5, 2), dtype=jnp.float64)
        assert op._solve_structure(rhs) is None
        x = solve(op, rhs)
        np.testing.assert_allclose(
            x, jnp.linalg.solve(2.0 * k, rhs), rtol=1e-8
        )


class TestCIQNotInverse:
    def test_sqrt_matmul_via_inverse_false(self):
        """contour_integral_quad(inverse=False) returns K^{+1/2} rhs
        (reference utils/contour_integral_quad.py:153-154)."""
        from linear_operator_tpu.solvers.contour_integral_quad import (
            contour_integral_quad,
        )

        k = _psd(jax.random.PRNGKey(11), 24)
        rhs = jax.random.normal(jax.random.PRNGKey(12), (24, 2), dtype=jnp.float64)
        evals, evecs = jnp.linalg.eigh(k)
        sqrt_k = (evecs * jnp.sqrt(evals)) @ evecs.T
        with settings.minres_tolerance(1e-10), settings.num_contour_quadrature(31):
            solves, weights = contour_integral_quad(
                lambda v: k @ v, rhs, inverse=False, key=jax.random.PRNGKey(0)
            )
        approx = jnp.sum(
            weights.reshape(-1, 1, 1) * solves, axis=0
        )
        np.testing.assert_allclose(approx, sqrt_k @ rhs, rtol=1e-4, atol=1e-4)


class TestSqrtInvMatmulKey:
    def test_key_threads_through_public_api(self):
        """Stochastic-API convention: sqrt_inv_matmul takes key= at every
        layer (functions wrapper and operator method)."""
        k = _psd(jax.random.PRNGKey(13), 16)
        op = DenseLinearOperator(k)
        rhs = jax.random.normal(jax.random.PRNGKey(14), (16, 2), dtype=jnp.float64)
        evals, evecs = jnp.linalg.eigh(k)
        inv_sqrt_k = (evecs / jnp.sqrt(evals)) @ evecs.T
        with settings.minres_tolerance(1e-10):
            out = op.sqrt_inv_matmul(rhs, key=jax.random.PRNGKey(42))
        np.testing.assert_allclose(out, inv_sqrt_k @ rhs, rtol=1e-4, atol=1e-4)
