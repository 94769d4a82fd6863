"""Round-5 advisor fixes: CIQ batched preconditioned spectral estimate,
forward-only blocked pivoted Cholesky under grad, make_mesh device-drop
warning, degenerate-broadcast Sum matmul precision."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linear_operator_tpu import settings
from linear_operator_tpu.operators import DenseLinearOperator
from linear_operator_tpu.functions import pivoted_cholesky


def _psd(key, n, batch=(), scale=1.0):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return scale * (a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=jnp.float64))


class TestCIQBatchedPreconditionedSpectrum:
    def test_batched_spectral_range_uses_all_batch_elements(self):
        """Advisor (round 4, medium): with a preconditioner, the spectral
        range came from t_mats[..., 0, :, :] — batch element 0 only — so a
        batch element with a very different spectrum got mis-placed
        quadrature shifts.  Both elements must now be accurate."""
        from linear_operator_tpu.solvers.contour_integral_quad import (
            contour_integral_quad,
        )

        n = 16
        k0 = _psd(jax.random.PRNGKey(0), n, scale=1.0)
        k1 = _psd(jax.random.PRNGKey(1), n, scale=1e4)  # wildly larger spectrum
        K = jnp.stack([k0, k1])  # (2, n, n)
        rhs = jax.random.normal(jax.random.PRNGKey(2), (2, n, 1), dtype=jnp.float64)

        solves, weights = contour_integral_quad(
            lambda v: K @ v,
            rhs,
            num_quad=31,
            preconditioner=lambda v: v,  # trivial preconditioner: takes the CG branch
        )
        approx = jnp.einsum("q,q...->...", weights, solves)

        w, V = jnp.linalg.eigh(K)
        exact = V @ ((1.0 / jnp.sqrt(w))[..., None] * (jnp.swapaxes(V, -1, -2) @ rhs))
        for b in range(2):
            rel = float(
                jnp.linalg.norm(approx[b] - exact[b]) / jnp.linalg.norm(exact[b])
            )
            assert rel < 1e-3, f"batch element {b}: rel error {rel}"


class TestBlockedPivotedCholeskyForwardOnly:
    def test_grad_through_blocked_path_raises(self):
        K = _psd(jax.random.PRNGKey(3), 32)

        def f(Km):
            L = pivoted_cholesky(DenseLinearOperator(Km), rank=12)
            return jnp.sum(L**2)

        with settings.pivoted_cholesky_block_size(4):
            with pytest.raises(NotImplementedError, match="forward-only"):
                jax.grad(f)(K)

    def test_forward_still_works_and_grad_without_flag(self):
        K = _psd(jax.random.PRNGKey(4), 32)
        with settings.pivoted_cholesky_block_size(4):
            L = pivoted_cholesky(DenseLinearOperator(K), rank=32)
        np.testing.assert_allclose(L @ L.T, K, rtol=1e-8, atol=1e-8)

        def f(Km):
            return jnp.sum(pivoted_cholesky(DenseLinearOperator(Km), rank=12) ** 2)

        g = jax.grad(f)(K)  # sequential path: differentiable
        assert bool(jnp.all(jnp.isfinite(g)))


class TestMakeMeshDeviceDropWarning:
    def test_explicit_n_devices_does_not_warn(self):
        from linear_operator_tpu.parallel import make_mesh

        jax.effects_barrier()  # flush stray async solver-warning callbacks
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            mesh = make_mesh(4, data=2, model=2)
        assert mesh.devices.shape == (2, 2)
        assert not any("uses only" in str(x.message) for x in w)

    def test_partial_tiling_warns(self):
        from linear_operator_tpu.parallel import make_mesh

        with pytest.warns(UserWarning, match="uses only"):
            make_mesh(data=3)  # 3 of 8 devices


class TestSumDegenerateBroadcastPrecision:
    def test_broadcast_term_matmul_value(self):
        k = _psd(jax.random.PRNGKey(5), 6)
        col = jax.random.normal(jax.random.PRNGKey(6), (6, 1), dtype=jnp.float64)
        s = DenseLinearOperator(k) + DenseLinearOperator(col)
        rhs = jax.random.normal(jax.random.PRNGKey(7), (6, 3), dtype=jnp.float64)
        np.testing.assert_allclose(
            s @ rhs, (k + jnp.broadcast_to(col, (6, 6))) @ rhs, rtol=1e-12
        )
