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


class TestGetitemBoolMask:
    def test_1d_bool_mask_rows(self):
        k = jax.random.normal(jax.random.PRNGKey(15), (4, 6), dtype=jnp.float64)
        mask = jnp.array([True, False, True, False])
        out = DenseLinearOperator(k)[mask]
        assert out.shape == (2, 6)
        np.testing.assert_allclose(
            out.to_dense() if hasattr(out, "to_dense") else out,
            np.asarray(k)[np.asarray(mask)],
            rtol=1e-12,
        )

    def test_bool_mask_wrong_length_raises(self):
        import pytest

        k = jax.random.normal(jax.random.PRNGKey(16), (4, 6), dtype=jnp.float64)
        with pytest.raises(IndexError):
            DenseLinearOperator(k)[jnp.array([True, False])]


class TestGetitemNoneAfterInt:
    def test_none_lands_at_output_position(self):
        """op[1, None] on (2,3,4,5): the new axis precedes the surviving
        dims (numpy/torch semantics), not the raw index-tuple position."""
        t = jax.random.normal(jax.random.PRNGKey(17), (2, 3, 4, 5), dtype=jnp.float64)
        out = DenseLinearOperator(t)[1, None]
        expected = np.asarray(t)[1, None]
        assert out.shape == expected.shape == (1, 3, 4, 5)
        np.testing.assert_allclose(out.to_dense(), expected, rtol=1e-12)

    def test_none_after_slice_and_int(self):
        t = jax.random.normal(jax.random.PRNGKey(18), (2, 3, 4, 5), dtype=jnp.float64)
        out = DenseLinearOperator(t)[:, 1, None]
        expected = np.asarray(t)[:, 1, None]
        assert out.shape == expected.shape
        np.testing.assert_allclose(out.to_dense(), expected, rtol=1e-12)


class TestZeroGetitemJointBroadcast:
    def test_zero_matches_dense_shape(self):
        from linear_operator_tpu.operators import ZeroLinearOperator

        z = ZeroLinearOperator(shape_=(3, 3, 4, 5))
        d = DenseLinearOperator(jnp.zeros((3, 3, 4, 5)))
        ii = jnp.array([0, 1])
        out_z = z[ii, ii, :, :]
        out_d = d[ii, ii, :, :]
        assert out_z.shape == out_d.shape == (2, 4, 5)


class TestEagerProbeMeshGuard:
    def test_eager_inv_quad_logdet_under_probe_mesh(self):
        """Eager with_sharding_constraint requires exact divisibility; the
        default 10-probe + 1-rhs stack (11 columns) on a probe=2 mesh must
        skip the probe constraint instead of crashing (jit is unaffected —
        GSPMD pads there)."""
        from linear_operator_tpu.functions import inv_quad_logdet
        from linear_operator_tpu.operators.kernel import rbf_kernel_operator
        from linear_operator_tpu.parallel import make_mesh

        mesh = make_mesh(8, data=2, model=2, probe=2)
        n = 64
        x = jax.random.normal(jax.random.PRNGKey(19), (n, 2), dtype=jnp.float64)
        op = rbf_kernel_operator(x, lengthscale=1.0, outputscale=1.0).add_diagonal(
            jnp.asarray(0.5, dtype=jnp.float64)
        )
        y = jax.random.normal(jax.random.PRNGKey(20), (n, 1), dtype=jnp.float64)
        with settings.max_cholesky_size(0), mesh:
            iq, ld = inv_quad_logdet(op, y, logdet=True, key=jax.random.PRNGKey(0))
        assert bool(jnp.isfinite(iq)) and bool(jnp.isfinite(ld))


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
