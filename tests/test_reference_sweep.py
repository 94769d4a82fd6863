"""Round-4 reference-test parity sweep.

Each test class mirrors a custom (non-harness) test in the reference's
external test/ tree that had no explicit equivalent here; citations point at
/root/reference/test/... counterparts.
"""

import jax
import jax.numpy as jnp

from linear_operator_tpu import settings
from linear_operator_tpu.operators import (
    AddedDiagLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
    LowRankRootLinearOperator,
    MatmulLinearOperator,
    RootLinearOperator,
    ZeroLinearOperator,
    to_linear_operator,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase


class TestMatmulDiagOptimization(BaseTestCase):
    """Reference test/operators/test_matmul_linear_operator.py:59-108:
    diagonal factors of a lazy product densify by elementwise scaling."""

    def test_diag_left_matmul_to_dense(self):
        diag = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        A = jax.random.normal(self.key, (4, 5), dtype=jnp.float64)
        result = MatmulLinearOperator(DiagLinearOperator(diag), DenseLinearOperator(A))
        self.assertAllClose(result.to_dense(), jnp.diag(diag) @ A, rtol=1e-12, atol=1e-12)

    def test_diag_right_matmul_to_dense(self):
        diag = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
        A = jax.random.normal(self.key, (4, 5), dtype=jnp.float64)
        result = MatmulLinearOperator(DenseLinearOperator(A), DiagLinearOperator(diag))
        self.assertAllClose(result.to_dense(), A @ jnp.diag(diag), rtol=1e-12, atol=1e-12)

    def test_diag_sandwich_to_dense(self):
        diag1 = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        diag2 = jnp.asarray([0.5, 1.5, 2.5, 3.5])
        A = jax.random.normal(self.key, (4, 4), dtype=jnp.float64)
        result = DiagLinearOperator(diag1) @ DenseLinearOperator(A) @ DiagLinearOperator(diag2)
        expected = jnp.diag(diag1) @ A @ jnp.diag(diag2)
        self.assertAllClose(result.to_dense(), expected, rtol=1e-12, atol=1e-12)

    def test_diag_sandwich_batch(self):
        d1 = jnp.abs(jax.random.normal(self.key, (3, 4), dtype=jnp.float64))
        d2 = jnp.abs(jax.random.normal(self.key, (3, 4), dtype=jnp.float64))
        A = jax.random.normal(self.key, (3, 4, 4), dtype=jnp.float64)
        result = DiagLinearOperator(d1) @ DenseLinearOperator(A) @ DiagLinearOperator(d2)
        expected = d1[..., :, None] * A * d2[..., None, :]
        self.assertAllClose(result.to_dense(), expected, rtol=1e-12, atol=1e-12)


class TestSumBroadcasting(BaseTestCase):
    """Reference test/operators/test_sum_linear_operator.py:66-102."""

    def test_broadcast_same_shape(self):
        t1 = to_linear_operator(jax.random.normal(self.key, (30, 30), dtype=jnp.float64))
        t2 = jax.random.normal(self.key, (30, 30), dtype=jnp.float64)
        res = t1 + t2
        final = res + t2
        expected = res.to_dense() + t2
        self.assertEqual(final.shape, expected.shape)
        self.assertAllClose(final.to_dense(), expected, rtol=1e-12, atol=1e-12)

    def test_broadcast_tensor_shape(self):
        t1 = to_linear_operator(jax.random.normal(self.key, (30, 30), dtype=jnp.float64))
        t2 = jax.random.normal(self.key, (30, 1), dtype=jnp.float64)
        res = t1 + t2
        final = res + t2
        expected = res.to_dense() + t2
        self.assertEqual(final.shape, expected.shape)
        self.assertAllClose(final.to_dense(), expected, rtol=1e-12, atol=1e-12)

    def test_broadcast_lazy_shape(self):
        t1 = to_linear_operator(jax.random.normal(self.key, (30, 1), dtype=jnp.float64))
        t2 = jax.random.normal(self.key, (30, 30), dtype=jnp.float64)
        res = t1 + t2
        final = res + t2
        expected = res.to_dense() + t2
        self.assertEqual(final.shape, expected.shape)
        self.assertAllClose(final.to_dense(), expected, rtol=1e-12, atol=1e-12)


class TestZeroAddDiagonal(BaseTestCase):
    """Reference test/operators/test_zero_linear_operator.py:120-163."""

    def test_add_diagonal_scalar_and_vector(self):
        eye5 = jnp.eye(5, dtype=jnp.float64)
        for diag, expected in [
            (jnp.asarray(1.5), eye5 * 1.5),
            (jnp.asarray([1.5]), eye5 * 1.5),
            (
                jnp.asarray([1.5, 1.3, 1.2, 1.1, 2.0]),
                jnp.diag(jnp.asarray([1.5, 1.3, 1.2, 1.1, 2.0])),
            ),
        ]:
            res = ZeroLinearOperator(shape_=(5, 5), dtype_="float64").add_diagonal(diag)
            self.assertAllClose(res.to_dense(), expected, rtol=0, atol=0)

    def test_add_diagonal_batch(self):
        eye5 = jnp.eye(5, dtype=jnp.float64)
        z = ZeroLinearOperator(shape_=(2, 5, 5), dtype_="float64")
        self.assertAllClose(
            z.add_diagonal(jnp.asarray(1.5)).to_dense(),
            jnp.tile(eye5 * 1.5, (2, 1, 1)),
            rtol=0,
            atol=0,
        )
        v = jnp.asarray([1.5, 1.3, 1.2, 1.1, 2.0])
        self.assertAllClose(
            z.add_diagonal(v).to_dense(),
            jnp.tile(jnp.diag(v), (2, 1, 1)),
            rtol=0,
            atol=0,
        )
        m = jnp.asarray([[1.5, 1.3, 1.2, 1.1, 2.0], [0.0, 1.0, 2.0, 1.0, 1.0]])
        self.assertAllClose(
            z.add_diagonal(m).to_dense(),
            jax.vmap(jnp.diag)(m),
            rtol=0,
            atol=0,
        )

    def test_matmul_zero(self):
        zero = ZeroLinearOperator(shape_=(5, 4, 3), dtype_="float64")
        square = ZeroLinearOperator(shape_=(5, 3, 3), dtype_="float64")
        product = zero.matmul(square)
        self.assertAllClose(product.to_dense(), jnp.zeros((5, 4, 3)), rtol=0, atol=0)


_CALLS = {"n": 0}


def _deflation_preconditioner(op):
    """Deflation preconditioner from the top-k eigenpairs (reference
    test/operators/test_added_diag_linear_operator.py:84-120; made SPD here —
    P = V diag(lam) V^T + (I - V V^T) — so preconditioned CG stays valid on
    the full space, where the reference's pure projection is singular)."""
    _CALLS["n"] += 1
    evals, evecs = jnp.linalg.eigh(op.to_dense())
    top_vals = evals[..., -40:]
    top_vecs = evecs[..., -40:]
    precond_op = RootLinearOperator(
        DenseLinearOperator(top_vecs * jnp.sqrt(top_vals)[..., None, :])
    ).add_diagonal(jnp.asarray(1.0, evals.dtype))

    def closure(rhs):
        vt_rhs = top_vecs.T @ rhs
        return rhs + top_vecs @ (vt_rhs / top_vals[..., :, None] - vt_rhs)

    return closure, precond_op, jnp.sum(jnp.log(top_vals), axis=-1)


class TestAddedDiagPrecondOverride(BaseTestCase):
    """Reference TestAddedDiagLinearOperatorPrecondOverride
    (test_added_diag_linear_operator.py:84-120): a user-supplied
    ``preconditioner_override`` drives the CG solve and the solve stays
    correct."""

    def test_precond_solve(self):
        n, k = 200, 150
        tensor = jax.random.normal(self.key, (n, k), dtype=jnp.float64)
        diag = jnp.abs(jax.random.normal(self.key, (n,), dtype=jnp.float64)) + 0.5

        standard = AddedDiagLinearOperator(
            RootLinearOperator(DenseLinearOperator(tensor)),
            DiagLinearOperator(diag),
        )
        overrode = AddedDiagLinearOperator(
            RootLinearOperator(DenseLinearOperator(tensor)),
            DiagLinearOperator(diag),
            preconditioner_override=_deflation_preconditioner,
        )

        rhs = jax.random.normal(self.key, (n, 1), dtype=jnp.float64)
        before = _CALLS["n"]
        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
             settings.max_cg_iterations(2000):
            x_std = standard.solve(rhs)
            x_ovr = overrode.solve(rhs)
        self.assertGreater(_CALLS["n"], before)  # override was consulted
        dense = tensor @ tensor.T + jnp.diag(diag)
        expected = jnp.linalg.solve(dense, rhs)
        self.assertAllClose(x_std, expected, rtol=1e-5, atol=1e-5)
        self.assertAllClose(x_ovr, expected, rtol=1e-5, atol=1e-5)


class TestRootDecompositionExact(BaseTestCase):
    """Reference test/operators/test_dense_linear_operator.py:25-33:
    with fast covar_root_decomposition off, root_decomposition reproduces
    K @ v to 10% normwise."""

    def _check(self, batch=()):
        a = jax.random.normal(self.key, (*batch, 8, 8), dtype=jnp.float64)
        K = a @ jnp.swapaxes(a, -1, -2) + 0.5 * jnp.eye(8, dtype=jnp.float64)
        op = DenseLinearOperator(K)
        v = jax.random.normal(self.key, (*batch, 8, 5), dtype=jnp.float64)
        with settings.fast_computations(covar_root_decomposition=False):
            root = op.root_decomposition().root.to_dense()
        res = root @ (jnp.swapaxes(root, -1, -2) @ v)
        actual = K @ v
        rel = jnp.linalg.norm(res - actual) / jnp.linalg.norm(actual)
        self.assertLess(float(rel), 0.1)

    def test_root_decomposition_exact(self):
        self._check()

    def test_root_decomposition_exact_batch(self):
        self._check(batch=(3,))


class TestLowRankRootAddedDiagRootCholesky(BaseTestCase):
    """Reference test/operators/test_low_rank_root_added_diag_linear_operator.py:104-106."""

    def test_root_decomposition_cholesky(self):
        n, k = 12, 3
        U = jax.random.normal(self.key, (n, k), dtype=jnp.float64)
        d = jnp.abs(jax.random.normal(self.key, (n,), dtype=jnp.float64)) + 0.5
        op = LowRankRootLinearOperator(DenseLinearOperator(U)) + DiagLinearOperator(d)
        dense = U @ U.T + jnp.diag(d)
        with settings.max_cholesky_size(10_000), settings.fast_computations(
            covar_root_decomposition=False
        ):
            root = op.root_decomposition(method="cholesky").root.to_dense()
        self.assertAllClose(root @ root.T, dense, rtol=1e-8, atol=1e-8)


class TestInterpolationKernels(BaseTestCase):
    """Reference test/utils/test_interpolation.py:11-131: left_interp /
    left_t_interp on vector / matrix / batch / batch-matrix operands, vs a
    dense interpolation matrix."""

    def _make(self, batch, n=6, k=3, M=10):
        ki, kv = jax.random.split(self.key)
        idx = jax.random.randint(ki, (*batch, n, k), 0, M)
        val = jax.random.normal(kv, (*batch, n, k), dtype=jnp.float64)
        # dense W via one-hot scatter
        W = jnp.sum(
            jax.nn.one_hot(idx, M, dtype=jnp.float64) * val[..., None], axis=-2
        )  # (*batch, n, M)
        return idx, val, W

    def _check(self, idx_batch, rhs_batch, t):
        from linear_operator_tpu.utils.sparse import left_interp, left_t_interp

        M = 10
        idx, val, W = self._make(idx_batch, M=M)
        rhs = jax.random.normal(self.key, (*rhs_batch, M, t), dtype=jnp.float64)
        self.assertAllClose(
            left_interp(idx, val, rhs), W @ rhs, rtol=1e-12, atol=1e-12
        )
        rhs_t = jax.random.normal(self.key, (*rhs_batch, 6, t), dtype=jnp.float64)
        self.assertAllClose(
            left_t_interp(idx, val, rhs_t, M),
            jnp.swapaxes(W, -1, -2) @ rhs_t,
            rtol=1e-12,
            atol=1e-12,
        )

    def test_on_a_vector(self):
        self._check((), (), 1)

    def test_on_a_matrix(self):
        self._check((), (), 4)

    def test_batch_on_a_vector(self):
        self._check((5,), (5,), 1)

    def test_batch_on_a_matrix(self):
        self._check((5,), (5,), 4)

    def test_batch_indices_unbatched_rhs(self):
        self._check((5,), (), 4)

    def test_multibatch_on_a_matrix(self):
        self._check((2, 5), (2, 5), 4)


class TestCholInverse(BaseTestCase):
    """Reference test/operators/test_chol_linear_operator.py:36-59: inverse()
    value and gradient vs the dense inverse."""

    def _chol(self):
        a = jax.random.normal(jax.random.PRNGKey(44), (6, 6), dtype=jnp.float64)
        K = a @ a.T + 2.0 * jnp.eye(6, dtype=jnp.float64)
        return jnp.linalg.cholesky(K)

    def test_inverse(self):
        from linear_operator_tpu.operators import CholLinearOperator, TriangularLinearOperator

        L = self._chol()
        op = CholLinearOperator(TriangularLinearOperator(L))
        dense = L @ L.T
        self.assertAllClose(
            op.inverse().to_dense(), jnp.linalg.inv(dense), rtol=1e-9, atol=1e-9
        )

        def f_lazy(Lm):
            o = CholLinearOperator(TriangularLinearOperator(Lm))
            return jnp.sum(o.inverse().to_dense())

        def f_dense(Lm):
            return jnp.sum(jnp.linalg.inv(Lm @ Lm.T))

        ga = jax.grad(f_lazy)(L)
        ge = jax.grad(f_dense)(L)
        # only the lower triangle is meaningful (reference compares .tril())
        self.assertAllClose(jnp.tril(ga), jnp.tril(ge), rtol=1e-7, atol=1e-7)


class TestSumBroadcastSolvePaths(BaseTestCase):
    """Round-4 review findings: broadcast-matrix-dim sums must survive the
    solver closures, the solve VJP's bilinear derivative, and getitem."""

    def _op(self):
        col = jax.random.normal(self.key, (6, 1), dtype=jnp.float64)
        full = jax.random.normal(self.key, (6, 6), dtype=jnp.float64)
        s = to_linear_operator(col) + full
        dense = col + full
        return s, dense, col, full

    def test_matmul_closure_and_solve_grad(self):
        s, dense, col, full = self._op()
        rhs = jax.random.normal(self.key, (6, 2), dtype=jnp.float64)
        self.assertAllClose(s._matmul_closure()(rhs), dense @ rhs, rtol=1e-12, atol=1e-12)
        # PD symmetrized system so solve converges; grads must not crash
        spd = s @ s.mT + to_linear_operator(3.0 * jnp.eye(6, dtype=jnp.float64))

        def f(c):
            op = (to_linear_operator(c) + full)
            op = op @ op.mT + to_linear_operator(3.0 * jnp.eye(6, dtype=jnp.float64))
            return jnp.sum(op.solve(rhs))

        g = jax.grad(f)(col)
        d = dense @ dense.T + 3.0 * jnp.eye(6)
        ge = jax.grad(
            lambda c: jnp.sum(jnp.linalg.solve((c + full) @ (c + full).T + 3.0 * jnp.eye(6), rhs))
        )(col)
        self.assertAllClose(g, ge, rtol=1e-8, atol=1e-8)
        self.assertAllClose(spd.solve(rhs), jnp.linalg.solve(d, rhs), rtol=1e-8, atol=1e-8)

    def test_getitem_and_get_indices(self):
        s, dense, _, _ = self._op()
        sub = s[1:4, 2:5]
        sub = sub.to_dense() if hasattr(sub, "to_dense") else sub
        self.assertAllClose(sub, dense[1:4, 2:5], rtol=1e-12, atol=1e-12)
        i = jnp.asarray([0, 2, 5])
        j = jnp.asarray([1, 1, 3])
        self.assertAllClose(s[i, j], dense[i, j], rtol=1e-12, atol=1e-12)


class TestKronTriangularExpandKeepsUpper(BaseTestCase):
    """Round-4 review finding: _expand_batch must preserve the ``upper``
    static field of KroneckerProductTriangularLinearOperator."""

    def test_expand_batch_upper(self):
        from linear_operator_tpu.operators import (
            KroneckerProductTriangularLinearOperator,
            TriangularLinearOperator,
        )

        r1 = jnp.triu(jax.random.normal(self.key, (2, 2), dtype=jnp.float64)) + 2 * jnp.eye(2)
        r2 = jnp.triu(jax.random.normal(self.key, (3, 3), dtype=jnp.float64)) + 2 * jnp.eye(3)
        kt = KroneckerProductTriangularLinearOperator(
            TriangularLinearOperator(r1, upper=True),
            TriangularLinearOperator(r2, upper=True),
            upper=True,
        )
        expanded = kt._expand_batch((4,))
        self.assertTrue(expanded.upper)
        self.assertAllClose(
            expanded.to_dense(),
            jnp.broadcast_to(jnp.kron(r1, r2), (4, 6, 6)),
            rtol=1e-12,
            atol=1e-12,
        )


class TestTorchDeviceDtypeAPI(BaseTestCase):
    """Reference ``to``/``type``/``cpu``/``cuda``/``requires_grad_``
    (reference _linear_operator.py:2606-2725, 2117-2126): JAX-native shims."""

    def test_to_type_cpu_requires_grad(self):
        op = DenseLinearOperator(jnp.eye(3, dtype=jnp.float64))
        self.assertEqual(op.type(), jnp.float64)
        self.assertEqual(op.to(jnp.float32).dtype, jnp.float32)
        self.assertEqual(op.type(jnp.float32).dtype, jnp.float32)
        moved = op.to(jax.devices("cpu")[0])
        self.assertEqual(moved.device.platform, "cpu")
        self.assertEqual(op.cpu().device.platform, "cpu")
        self.assertIs(op.requires_grad_(True), op)
        self.assertAllClose(op.cuda().to_dense(), jnp.eye(3), rtol=0, atol=0)


class TestPreconditionedCIQ(BaseTestCase):
    """Round-4: preconditioned MINRES/CIQ (reference
    utils/contour_integral_quad.py:44-48, 141-150; utils/minres.py:17, 75,
    144-150).  The preconditioned quadrature's weighted sum is the
    non-symmetric root M with M M^T = K^{-1} exactly; sampling covariance is
    exact; the VJP is exact with the preconditioner held fixed."""

    def _op(self, d=None):
        n, r = 120, 30
        U = jax.random.normal(jax.random.PRNGKey(20), (n, r), jnp.float64) / jnp.sqrt(r)
        if d is None:
            d = 0.01 + 0.1 * jnp.abs(
                jax.random.normal(jax.random.PRNGKey(21), (n,), jnp.float64)
            )
        op = AddedDiagLinearOperator(
            RootLinearOperator(DenseLinearOperator(U)), DiagLinearOperator(d)
        )
        return op, U, d

    def test_preconditioned_minres_solves_k_plus_sp(self):
        from linear_operator_tpu.solvers.minres import minres

        a = jax.random.normal(self.key, (40, 40), jnp.float64)
        K = a @ a.T + 5 * jnp.eye(40)
        P = K + 0.5 * jnp.eye(40)
        P_inv = jnp.linalg.inv(P)
        b = jax.random.normal(self.key, (40, 3), jnp.float64)
        sh = jnp.asarray([0.0, 1.0, 10.0])
        xs = minres(
            lambda v: K @ v, b, shifts=sh, tolerance=1e-12, max_iter=500,
            preconditioner=lambda z: P_inv @ z,
        )
        for i, s_ in enumerate([0.0, 1.0, 10.0]):
            self.assertAllClose(
                xs[i], jnp.linalg.solve(K + s_ * P, b), rtol=1e-8, atol=1e-8
            )

    def test_root_gram_and_sampling_covariance_exact(self):
        from linear_operator_tpu.functions import sqrt_matmul_ciq
        from linear_operator_tpu.functions._sqrt_inv_matmul import sqrt_inv_matmul

        op, U, d = self._op()
        K = U @ U.T + jnp.diag(d)
        n = K.shape[0]
        with settings.min_preconditioning_size(10), \
             settings.max_preconditioner_size(25), \
             settings.minres_tolerance(1e-10), \
             settings.num_contour_quadrature(15), settings.max_cg_iterations(1000):
            closure, _, _ = op._preconditioner()
            self.assertIsNotNone(closure)  # preconditioning really active
            M = sqrt_inv_matmul(op, jnp.eye(n, dtype=jnp.float64), key=self.key)
            S = sqrt_matmul_ciq(op, jnp.eye(n, dtype=jnp.float64), key=self.key)
        K_inv = jnp.linalg.inv(K)
        self.assertAllClose(M @ M.T, K_inv, rtol=1e-5, atol=1e-6)
        self.assertAllClose(S @ S.T, K, rtol=1e-6, atol=1e-7)

    def test_vjp_exact_with_frozen_preconditioner(self):
        from linear_operator_tpu.functions._sqrt_inv_matmul import sqrt_inv_matmul

        op, U, d = self._op()
        n = U.shape[0]
        with settings.min_preconditioning_size(10), \
             settings.max_preconditioner_size(25), settings.max_cg_iterations(1000):
            fixed = op._preconditioner()

        def f(dvec):
            o = AddedDiagLinearOperator(
                RootLinearOperator(DenseLinearOperator(U)),
                DiagLinearOperator(dvec),
                preconditioner_override=lambda _o: fixed,
            )
            return jnp.sum(sqrt_inv_matmul(o, jnp.ones((n, 1), jnp.float64), key=jax.random.PRNGKey(3)))

        with settings.minres_tolerance(1e-12), settings.num_contour_quadrature(15), \
             settings.max_cg_iterations(2000):
            g = jax.grad(f)(d)
            t = jax.random.normal(jax.random.PRNGKey(7), (n,), jnp.float64)
            eps = 1e-6
            fd = (f(d + eps * t) - f(d - eps * t)) / (2 * eps)
        self.assertAllClose(jnp.vdot(g, t), fd, rtol=1e-5, atol=1e-6)


class TestOperatorReviewFixes(BaseTestCase):
    """Round-4 operators-directory review: crashes/wrong values on valid
    inputs, all reproduced then fixed."""

    def test_triangular_reversed_slice_values(self):
        from linear_operator_tpu.operators import TriangularLinearOperator

        X = jnp.tril(
            jax.random.normal(self.key, (4, 4), jnp.float64) + 2 * jnp.eye(4)
        )
        tri = TriangularLinearOperator(DenseLinearOperator(X))
        got = tri[::-1, ::-1]
        got = got.to_dense() if hasattr(got, "to_dense") else got
        self.assertAllClose(got, X[::-1, ::-1], rtol=0, atol=0)

    def test_sum_mixed_batch_terms_getitem(self):
        from linear_operator_tpu.operators import ToeplitzLinearOperator

        d = jax.random.normal(self.key, (3, 4, 4), jnp.float64)
        col = jnp.exp(-0.5 * jnp.arange(4.0) ** 2)
        s = DenseLinearOperator(d) + ToeplitzLinearOperator(col)
        dense = d + s.operators[1].to_dense()
        sub = s[1]
        sub = sub.to_dense() if hasattr(sub, "to_dense") else sub
        self.assertAllClose(sub, dense[1], rtol=1e-12, atol=1e-12)
        i = jnp.asarray([0, 2])
        got = s[jnp.asarray([0, 1]), i, i]
        self.assertAllClose(got, dense[jnp.asarray([0, 1]), i, i], rtol=1e-12, atol=1e-12)

    def test_kronecker_mixed_batch_get_indices(self):
        from linear_operator_tpu.operators import KroneckerProductLinearOperator

        a = jax.random.normal(self.key, (3, 2, 2), jnp.float64)
        b = jax.random.normal(self.key, (3, 3), jnp.float64)
        kp = KroneckerProductLinearOperator(
            DenseLinearOperator(a), DenseLinearOperator(b)
        )
        dense = jnp.stack([jnp.kron(a[i], b) for i in range(3)])
        got = kp[jnp.asarray([1]), jnp.asarray([2]), jnp.asarray([3])]
        self.assertAllClose(got, dense[jnp.asarray([1]), jnp.asarray([2]), jnp.asarray([3])], rtol=1e-12, atol=1e-12)

    def test_constant_mul_batched_constant_getitem(self):
        d = jax.random.normal(self.key, (3, 4, 5, 5), jnp.float64)
        c = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        cm = DenseLinearOperator(d) * c
        dense = d * c[:, None, None]
        sub = cm[1, 2]
        sub = sub.to_dense() if hasattr(sub, "to_dense") else sub
        self.assertAllClose(sub, dense[1, 2], rtol=1e-12, atol=1e-12)

    def test_nystrom_factor_batched(self):
        from linear_operator_tpu.operators.added_diag import nystrom_factor

        a = jax.random.normal(self.key, (2, 50, 50), jnp.float64) / 7.0
        K = a @ jnp.swapaxes(a, -1, -2) + jnp.eye(50)
        op = DenseLinearOperator(K)
        L = nystrom_factor(op, rank=20)
        self.assertEqual(L.shape[:2], (2, 50))
        # Nystrom of a full-rank matrix at rank 20 is approximate; just
        # require PSD-sensible output (finite, correct shape, L L^T <= K-ish)
        self.assertTrue(bool(jnp.all(jnp.isfinite(L))))

    def test_cat_batch_concat_broadcast_rhs(self):
        from linear_operator_tpu.operators import cat

        a = jax.random.normal(self.key, (2, 4, 4), jnp.float64)
        b = jax.random.normal(self.key, (3, 4, 4), jnp.float64)
        c = cat([DenseLinearOperator(a), DenseLinearOperator(b)], dim=0)
        rhs = jnp.ones((4, 2), jnp.float64)
        got = c.matmul(rhs)
        want = jnp.concatenate([a, b], axis=0) @ rhs
        self.assertAllClose(got, want, rtol=1e-12, atol=1e-12)

    def test_permute_full_length_negative_dims(self):
        d = jax.random.normal(self.key, (2, 3, 4, 4), jnp.float64)
        op = DenseLinearOperator(d)
        got = op.permute(1, 0, -2, -1).to_dense()
        self.assertAllClose(got, jnp.transpose(d, (1, 0, 2, 3)), rtol=0, atol=0)

    def test_device_on_leafless_operator(self):
        from linear_operator_tpu.operators import IdentityLinearOperator

        self.assertIsNone(IdentityLinearOperator(3, dtype_="float64").device)


class TestUtilsFunctionsReviewFixes(BaseTestCase):
    """Round-4 utils/functions/parallel review: crashes on valid inputs."""

    def test_ellipsis_with_array_index(self):
        import numpy as np

        d = jax.random.normal(self.key, (6, 6), jnp.float64)
        op = DenseLinearOperator(d)
        got = op[..., np.array([0, 2])]
        got = got.to_dense() if hasattr(got, "to_dense") else got
        self.assertAllClose(got, d[:, jnp.asarray([0, 2])], rtol=0, atol=0)
        mask = np.array([True, False, True, False, True, False])
        got2 = op[..., np.array(mask), :]
        got2 = got2.to_dense() if hasattr(got2, "to_dense") else got2
        self.assertAllClose(got2, d[jnp.asarray(mask)], rtol=0, atol=0)

    def test_iqld_rhs_batch_broader_than_op(self):
        a = jax.random.normal(self.key, (30, 30), jnp.float64)
        K = a @ a.T + 10 * jnp.eye(30)
        op = DenseLinearOperator(K)
        rhs = jax.random.normal(self.key, (4, 30, 2), jnp.float64)
        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
             settings.num_trace_samples(64), settings.max_cg_iterations(500):
            iq, ld = op.inv_quad_logdet(rhs, logdet=True, key=self.key)
        want_iq = jnp.sum(jnp.linalg.solve(K, rhs) * rhs, axis=(-2, -1))
        self.assertAllClose(iq, want_iq, rtol=1e-6, atol=1e-6)
        self.assertEqual(ld.shape, (4,))
        # gradients must flow too (the bwd stacks broadcast correctly)
        def f(Km):
            o = DenseLinearOperator(Km)
            with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
                 settings.num_trace_samples(16), settings.max_cg_iterations(500):
                i2, l2 = o.inv_quad_logdet(rhs, logdet=True, key=self.key)
            return jnp.sum(i2) + jnp.sum(l2)

        g = jax.grad(f)(K)
        self.assertTrue(bool(jnp.all(jnp.isfinite(g))))

    def test_sqrt_inv_matmul_unbatched_rhs_batched_op(self):
        a = jax.random.normal(self.key, (2, 12, 12), jnp.float64)
        K = a @ jnp.swapaxes(a, -1, -2) + 6 * jnp.eye(12)
        op = DenseLinearOperator(K)
        rhs = jax.random.normal(self.key, (12, 3), jnp.float64)
        with settings.minres_tolerance(1e-12), settings.num_contour_quadrature(25):
            out = op.sqrt_inv_matmul(rhs)
        evals, evecs = jnp.linalg.eigh(K)
        inv_sqrt = (evecs / jnp.sqrt(evals)[..., None, :]) @ jnp.swapaxes(evecs, -1, -2)
        self.assertAllClose(out, inv_sqrt @ rhs, rtol=1e-6, atol=1e-6)

    def test_toeplitz_matmul_mixed_complex(self):
        from linear_operator_tpu.utils.toeplitz import toeplitz_matmul

        col = jnp.asarray([3.0, 1.0, 0.5, 0.1]) + 1j * jnp.asarray([0.0, 0.2, 0.1, 0.0])
        row = jnp.asarray([3.0, 0.8, 0.3, 0.05]) + 1j * jnp.asarray([0.0, 0.1, 0.0, 0.0])
        row = row.at[0].set(col[0])
        x = jax.random.normal(self.key, (4, 2), jnp.float64)
        from scipy.linalg import toeplitz as sp_toeplitz
        import numpy as np

        T = jnp.asarray(sp_toeplitz(np.asarray(col), np.asarray(row)))
        got = toeplitz_matmul(col, row, x)
        self.assertTrue(jnp.iscomplexobj(got))
        self.assertAllClose(got, T @ x.astype(T.dtype), rtol=1e-10, atol=1e-10)

    def test_left_t_interp_probe_batched_rhs(self):
        from linear_operator_tpu.utils.sparse import left_t_interp

        ki, kv = jax.random.split(self.key)
        idx = jax.random.randint(ki, (2, 5, 3), 0, 6)
        val = jax.random.normal(kv, (2, 5, 3), jnp.float64)
        rhs = jax.random.normal(self.key, (4, 2, 5, 7), jnp.float64)
        out = left_t_interp(idx, val, rhs, 6)
        W = jnp.sum(jax.nn.one_hot(idx, 6, dtype=jnp.float64) * val[..., None], axis=-2)
        self.assertAllClose(out, jnp.swapaxes(W, -1, -2) @ rhs, rtol=1e-12, atol=1e-12)

    def test_make_mesh_non_divisible(self):
        from linear_operator_tpu.parallel import make_mesh

        with self.assertWarns(UserWarning):  # 4 of 8 devices used -> warn
            mesh = make_mesh(data=2, model=2)  # 8 virtual devices available
        self.assertEqual(mesh.devices.shape, (2, 2))
        with self.assertWarns(UserWarning):
            mesh3 = make_mesh(probe=3)
        self.assertEqual(mesh3.devices.shape[-1], 3)

    def test_iqld_vector_rhs_unreduced_squeezes(self):
        a = jax.random.normal(self.key, (8, 8), jnp.float64)
        K = a @ a.T + 4 * jnp.eye(8)
        op = DenseLinearOperator(K)
        v = jax.random.normal(self.key, (8,), jnp.float64)
        iq, _ = op.inv_quad_logdet(v, logdet=False, reduce_inv_quad=False)
        self.assertEqual(iq.shape, ())
        self.assertAllClose(iq, v @ jnp.linalg.solve(K, v), rtol=1e-10, atol=1e-10)

    def test_root_decomposition_grad_without_inverse(self):
        a = jax.random.normal(self.key, (10, 10), jnp.float64)
        K = a @ a.T + 5 * jnp.eye(10)

        def f(Km):
            o = DenseLinearOperator(Km)
            with settings.max_cholesky_size(0), settings.max_root_decomposition_size(10):
                r = o.root_decomposition(method="lanczos").root.to_dense()
            return jnp.sum(r @ jnp.swapaxes(r, -1, -2))

        g = jax.grad(f)(K)
        # d/dK sum(R R^T) with R R^T ~= K (full-rank Lanczos) ~= ones matrix
        self.assertAllClose(g, jnp.ones_like(g), rtol=0.3, atol=0.3)


class TestReviewFixFollowups(BaseTestCase):
    """Adversarial review of the round-4 review-fix batch itself: three
    concrete failures in the first cut, each reproduced then fixed."""

    def test_interpolated_get_indices_mixed_batch_base(self):
        from linear_operator_tpu.operators import InterpolatedLinearOperator

        kb, ki, kv = jax.random.split(self.key, 3)
        base = DenseLinearOperator(
            jax.random.normal(kb, (1, 6, 6), jnp.float64)
        )
        li = jax.random.randint(ki, (3, 5, 2), 0, 6)
        lv = jax.random.normal(kv, (3, 5, 2), jnp.float64)
        op = InterpolatedLinearOperator(base, li, lv, li, lv)
        dense = op.to_dense()
        b = jnp.asarray([2, 2])
        r = jnp.asarray([0, 3])
        c = jnp.asarray([1, 4])
        got = op._get_indices(r, c, b)
        want = dense[b, r, c]
        self.assertAllClose(got, want, rtol=1e-12, atol=1e-12)
        # fully unbatched base under batched interp arrays must work too
        op2 = InterpolatedLinearOperator(
            DenseLinearOperator(base.to_dense()[0]), li, lv, li, lv
        )
        got2 = op2._get_indices(r, c, b)
        self.assertAllClose(got2, op2.to_dense()[b, r, c], rtol=1e-12, atol=1e-12)

    def test_cat_batch_concat_singleton_batch_rhs(self):
        from linear_operator_tpu.operators import cat

        a = jax.random.normal(self.key, (2, 4, 4), jnp.float64)
        b = jax.random.normal(self.key, (3, 4, 4), jnp.float64)
        c = cat([DenseLinearOperator(a), DenseLinearOperator(b)], dim=0)
        rhs = jnp.ones((1, 4, 2), jnp.float64)
        got = c.matmul(rhs)
        want = jnp.concatenate([a, b], axis=0) @ rhs
        self.assertAllClose(got, want, rtol=1e-12, atol=1e-12)

    def test_make_mesh_oversize_axis_raises(self):
        from linear_operator_tpu.parallel import make_mesh

        with self.assertRaises(ValueError):
            make_mesh(model=16)  # 8 virtual devices -> data = 0

    def test_interp_to_dense_batched_scatter(self):
        # latent pre-round-4 bug: out.at[..., rows, idx] with BATCHED idx
        # added every batch's values into every batch slice
        from linear_operator_tpu.operators import InterpolatedLinearOperator

        kb, ki, kv = jax.random.split(self.key, 3)
        base = DenseLinearOperator(
            jax.random.normal(kb, (3, 6, 6), jnp.float64)
        )
        li = jax.random.randint(ki, (3, 5, 2), 0, 6)
        lv = jax.random.normal(kv, (3, 5, 2), jnp.float64)
        op = InterpolatedLinearOperator(base, li, lv, li, lv)
        # to_dense must agree with the matmul path against the identity
        eye = jnp.eye(5, dtype=jnp.float64)
        self.assertAllClose(
            op.to_dense(), op.matmul(eye), rtol=1e-12, atol=1e-12
        )
