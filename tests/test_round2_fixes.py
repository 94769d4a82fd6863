"""Round-2 correctness fixes: getitem mixed basic/advanced + lazy selection,
Kronecker add_diagonal dispatch, NaN guards, per-batch CG stopping,
solve_triangular validation, kernel K-caching closures."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linear_operator_tpu import settings
from linear_operator_tpu.operators import (
    AddedDiagLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
    KroneckerProductAddedDiagLinearOperator,
    KroneckerProductLinearOperator,
    TriangularLinearOperator,
)
from linear_operator_tpu.operators.interpolated import InterpolatedLinearOperator
from linear_operator_tpu.operators.kernel import (
    KernelLinearOperator,
    rbf_kernel_operator,
    rbf_pallas_matvec,
)
from linear_operator_tpu.functions import inv_quad_logdet, solve
from linear_operator_tpu.solvers.linear_cg import linear_cg
from linear_operator_tpu.utils.warnings import NumericalWarning


def _psd(key, *batch, n=8):
    a = jax.random.normal(key, (*batch, n, n), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n, dtype=jnp.float64)


# ---------------------------------------------------------------------------
# getitem: mixed basic+advanced indexing (ADVICE r1 item 1 + lazy selection)
# ---------------------------------------------------------------------------


class TestGetitemMixed:
    def setup_method(self):
        self.dense = np.asarray(
            jax.random.normal(jax.random.PRNGKey(0), (5, 7), dtype=jnp.float64)
        )
        self.op = DenseLinearOperator(jnp.asarray(self.dense))

    def _check(self, index):
        got = self.op[index]
        if hasattr(got, "to_dense"):
            got = got.to_dense()
        np.testing.assert_allclose(np.asarray(got), self.dense[index], rtol=1e-12)

    def test_col_array(self):
        self._check((slice(None), np.array([1, 2])))

    def test_row_array(self):
        self._check((np.array([0, 4, 2]), slice(None)))

    def test_row_array_col_partial_slice(self):
        self._check((np.array([0, 4]), slice(1, 6, 2)))

    def test_negative_indices(self):
        self._check((np.array([-1, 0]), slice(None)))

    def test_2d_array_rows(self):
        self._check((np.array([[0, 1], [2, 3]]), slice(None)))

    def test_2d_array_cols(self):
        self._check((slice(None), np.array([[0, 1], [2, 3]])))

    def test_both_arrays_joint_broadcast(self):
        self._check((np.array([0, 1]), np.array([2, 3])))

    def test_int_and_array(self):
        self._check((2, np.array([0, 3])))

    def test_chained_selection(self):
        got = self.op[np.array([0, 2, 4])][:, np.array([1, 5])]
        if hasattr(got, "to_dense"):
            got = got.to_dense()
        np.testing.assert_allclose(
            np.asarray(got), self.dense[np.array([0, 2, 4])][:, np.array([1, 5])]
        )

    def test_batched_mixed(self):
        dense = np.asarray(
            jax.random.normal(jax.random.PRNGKey(1), (3, 5, 7), dtype=jnp.float64)
        )
        op = DenseLinearOperator(jnp.asarray(dense))
        idx = np.array([1, 3])
        got = op[:, idx, :]
        if hasattr(got, "to_dense"):
            got = got.to_dense()
        np.testing.assert_allclose(np.asarray(got), dense[:, idx, :], rtol=1e-12)

    def test_selection_stays_lazy_generic(self):
        """A matrix-free operator indexed with a 1-D array must NOT densify
        (reference wraps in Interpolated selection, :303-313)."""
        x = jax.random.normal(jax.random.PRNGKey(2), (20, 3), dtype=jnp.float64)
        op = rbf_kernel_operator(x, lengthscale=1.0, outputscale=1.0)
        idx = jnp.array([3, 7, 11])
        sel = op[idx, :]
        assert isinstance(sel, KernelLinearOperator)  # fast path, still lazy
        v = jax.random.normal(jax.random.PRNGKey(3), (20, 2), dtype=jnp.float64)
        np.testing.assert_allclose(
            np.asarray(sel @ v),
            np.asarray(op.to_dense())[np.asarray(idx)] @ np.asarray(v),
            rtol=1e-10,
        )

    def test_selection_interpolated_fallback(self):
        """Operators without a selection fast path wrap in Interpolated."""
        mat = _psd(jax.random.PRNGKey(4), n=9)
        op = TriangularLinearOperator(DenseLinearOperator(mat))
        idx = jnp.array([0, 5, 2])
        sel = op[:, idx]
        assert isinstance(sel, InterpolatedLinearOperator)
        np.testing.assert_allclose(
            np.asarray(sel.to_dense()),
            np.asarray(op.to_dense())[:, np.asarray(idx)],
            rtol=1e-12,
        )


# ---------------------------------------------------------------------------
# Kronecker add_diagonal dispatch (ADVICE r1 item 2)
# ---------------------------------------------------------------------------


class TestKroneckerAddDiagonal:
    def test_type_and_fast_path(self):
        k1 = DenseLinearOperator(_psd(jax.random.PRNGKey(0), n=6))
        k2 = DenseLinearOperator(_psd(jax.random.PRNGKey(1), n=5))
        kron = KroneckerProductLinearOperator((k1, k2))
        op = kron.add_diagonal(jnp.asarray(0.3, jnp.float64))
        assert isinstance(op, KroneckerProductAddedDiagLinearOperator)
        rhs = jax.random.normal(jax.random.PRNGKey(2), (30, 2), dtype=jnp.float64)
        structural = op._solve_structure(rhs)
        assert structural is not None  # exact spectral-shift path is live
        expected = np.linalg.solve(np.asarray(op.to_dense()), np.asarray(rhs))
        np.testing.assert_allclose(np.asarray(structural), expected, rtol=1e-8)


class TestEighSafeGradients:
    def test_degenerate_eigh_grad_finite(self):
        """Kronecker spectral-shift solves must have finite gradients at
        isotropic (degenerate-eigenvalue) kernels — jnp.linalg.eigh's JVP
        would be NaN here; utils.eigh.eigh_safe zeroes the gauge term."""

        def loss(c):
            k1 = DenseLinearOperator(c * jnp.eye(3, dtype=jnp.float64))
            k2 = DenseLinearOperator(_psd(jax.random.PRNGKey(0), n=4))
            op = KroneckerProductLinearOperator((k1, k2)).add_diagonal(
                jnp.asarray(0.1, jnp.float64)
            )
            rhs = jnp.ones((12, 1), jnp.float64)
            iq, ld = inv_quad_logdet(op, rhs, logdet=True)
            return jnp.sum(iq) + jnp.sum(ld)

        g = jax.grad(loss)(jnp.asarray(2.0, jnp.float64))
        assert bool(jnp.isfinite(g))
        # cross-check against finite differences
        eps = 1e-5
        fd = (loss(jnp.asarray(2.0 + eps, jnp.float64)) -
              loss(jnp.asarray(2.0 - eps, jnp.float64))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


# ---------------------------------------------------------------------------
# NaN guards (VERDICT r1 item 6)
# ---------------------------------------------------------------------------


class TestNanGuards:
    def test_cg_nan_input_warns(self):
        mat = _psd(jax.random.PRNGKey(0), n=12)
        rhs = jnp.ones((12, 1), jnp.float64).at[3, 0].set(jnp.nan)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            result = linear_cg(lambda v: mat @ v, rhs, max_iter=5)
            jax.block_until_ready(result.solution)
        assert any(issubclass(x.category, NumericalWarning) for x in w)

    def test_nan_probe_nan_logdet(self):
        """NaN operator leaves -> NaN logdet, not quadrature garbage
        (reference functions/_inv_quad_logdet.py:141-142)."""
        mat = _psd(jax.random.PRNGKey(1), n=24).at[0, 0].set(jnp.nan)
        op = DenseLinearOperator(mat)
        with settings.max_cholesky_size(0), settings.num_trace_samples(4), \
             settings.min_preconditioning_size(1000):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                _, ld = inv_quad_logdet(
                    op, jnp.ones((24, 1), jnp.float64), logdet=True
                )
        assert bool(jnp.isnan(ld))

    def test_preconditioner_nan_bailout(self):
        """NaN pivoted-Cholesky factor -> preconditioner degrades to D^{-1}
        (reference added_diag_linear_operator.py:126-131 bails out)."""
        mat = _psd(jax.random.PRNGKey(2), n=16).at[2, 2].set(jnp.nan)
        diag = jnp.full((16,), 0.7, jnp.float64)
        op = AddedDiagLinearOperator(
            DenseLinearOperator(mat), DiagLinearOperator(diag)
        )
        with settings.max_preconditioner_size(4), settings.min_preconditioning_size(1):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                closure, _, logdet_p = op._preconditioner()
                v = jnp.ones((16, 2), jnp.float64)
                out = closure(v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(v / 0.7), rtol=1e-10)
        np.testing.assert_allclose(
            float(logdet_p), float(16 * jnp.log(0.7)), rtol=1e-10
        )


# ---------------------------------------------------------------------------
# Functional factorization cache (VERDICT r1 item 2)
# ---------------------------------------------------------------------------


class TestFactorizationReuse:
    def test_one_cholesky_across_solve_logdet_sample(self):
        """solve + inv_quad_logdet + sampling on the same operator cost ONE
        psd_safe_cholesky when routed through the factorization (the
        reference's memoize-cache semantics, utils/memoize.py:10-125)."""
        from unittest import mock

        import linear_operator_tpu.utils.cholesky as chol_mod

        mat = _psd(jax.random.PRNGKey(0), n=12)
        op = DenseLinearOperator(mat)
        rhs = jax.random.normal(jax.random.PRNGKey(1), (12, 2), dtype=jnp.float64)

        with mock.patch.object(
            chol_mod, "psd_safe_cholesky", wraps=chol_mod.psd_safe_cholesky
        ) as spy:
            factored = op.cholesky()
            x = solve(op, rhs, factored=factored)
            iq, ld = inv_quad_logdet(op, rhs, logdet=True, factored=factored)
            samples = op.with_factorization(factored).zero_mean_mvn_samples(
                3, key=jax.random.PRNGKey(2)
            )
        assert spy.call_count == 1
        expected = np.linalg.solve(np.asarray(mat), np.asarray(rhs))
        np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-9)
        np.testing.assert_allclose(
            float(ld), np.linalg.slogdet(np.asarray(mat))[1], rtol=1e-9
        )
        np.testing.assert_allclose(
            float(jnp.sum(iq)), float(np.sum(expected * np.asarray(rhs))), rtol=1e-9
        )
        assert samples.shape == (3, 12)

    def test_with_preconditioner_shares_factor(self):
        """AddedDiag.with_preconditioner(): the rank-k pivoted-Cholesky
        factor is built ONCE and reused by solve + inv_quad_logdet (the
        reference memoizes ``_preconditioner`` per object,
        added_diag_linear_operator.py:95-116), with identical results."""
        from unittest import mock

        import linear_operator_tpu.operators.added_diag as ad_mod
        from linear_operator_tpu import settings
        from linear_operator_tpu.operators import (
            AddedDiagLinearOperator,
            DiagLinearOperator,
        )

        mat = _psd(jax.random.PRNGKey(5), n=64)
        diag = jnp.full((64,), 0.5, jnp.float64)
        op = AddedDiagLinearOperator(DenseLinearOperator(mat), DiagLinearOperator(diag))
        rhs = jax.random.normal(jax.random.PRNGKey(6), (64, 1), dtype=jnp.float64)

        ctx = lambda: (
            settings.max_cholesky_size(0),
            settings.min_preconditioning_size(1),
            settings.max_preconditioner_size(8),
            settings.num_trace_samples(32),
            settings.cg_tolerance(1e-10),
        )

        with mock.patch.object(
            AddedDiagLinearOperator,
            "_build_precond_factor",
            autospec=True,
            side_effect=AddedDiagLinearOperator._build_precond_factor,
        ) as spy:
            c1, c2, c3, c4, c5 = ctx()
            with c1, c2, c3, c4, c5:
                pop = op.with_preconditioner()
                x = solve(pop, rhs)
                iq, ld = inv_quad_logdet(
                    pop, rhs, logdet=True, key=jax.random.PRNGKey(7)
                )
        assert spy.call_count == 1

        dense = np.asarray(op.to_dense())
        expected = np.linalg.solve(dense, np.asarray(rhs))
        np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-7)
        np.testing.assert_allclose(
            float(iq), float(np.sum(expected * np.asarray(rhs))), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(ld), np.linalg.slogdet(dense)[1], rtol=0.1
        )

        # plain path (factor rebuilt) gives the same solve
        c1, c2, c3, c4, c5 = ctx()
        with c1, c2, c3, c4, c5:
            x_plain = solve(op, rhs)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_plain), rtol=1e-7)

    def test_woodbury_factorize_shares_cap_cholesky(self):
        """LowRankRootAddedDiag.factorize(): one cap-matrix Cholesky shared
        across solve + inv_quad_logdet + logdet (the reference memoizes
        ``_cholesky_cap_mat``, low_rank_root_added_diag_linear_operator.py:
        37-47), with values identical to the unfactored path."""
        from linear_operator_tpu.operators import LowRankRootLinearOperator

        u = jax.random.normal(jax.random.PRNGKey(0), (40, 3), dtype=jnp.float64)
        noise = jnp.full((40,), 0.5, jnp.float64)
        op = LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(noise)
        rhs = jax.random.normal(jax.random.PRNGKey(1), (40, 2), dtype=jnp.float64)

        import jax.numpy.linalg as jla

        calls = []
        orig = jla.cholesky
        try:
            jla.cholesky = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
            fop = op.factorize()
            x = solve(fop, rhs)
            iq, ld = inv_quad_logdet(fop, rhs, logdet=True)
            ld2 = fop.logdet()
        finally:
            jla.cholesky = orig
        assert len(calls) == 1

        dense = np.asarray(u) @ np.asarray(u).T + 0.5 * np.eye(40)
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(dense, np.asarray(rhs)), rtol=1e-9
        )
        np.testing.assert_allclose(
            float(ld), np.linalg.slogdet(dense)[1], rtol=1e-9
        )
        np.testing.assert_allclose(float(ld2), float(ld), rtol=1e-12)
        np.testing.assert_allclose(
            float(iq),
            float(np.sum(np.linalg.solve(dense, np.asarray(rhs)) * np.asarray(rhs))),
            rtol=1e-9,
        )
        # gradients through the factorized path match the plain path
        def loss_factored(u):
            o = LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(noise)
            f = o.factorize()
            iq, ld = inv_quad_logdet(f, rhs, logdet=True)
            return jnp.sum(iq) + ld

        def loss_plain(u):
            o = LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(noise)
            iq, ld = inv_quad_logdet(o, rhs, logdet=True)
            return jnp.sum(iq) + ld

        g1 = jax.grad(loss_factored)(u)
        g2 = jax.grad(loss_plain)(u)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-7, atol=1e-10)

    def test_with_factorization_validates(self):
        op = DenseLinearOperator(_psd(jax.random.PRNGKey(0), n=6))
        other = DenseLinearOperator(_psd(jax.random.PRNGKey(1), n=5))
        with pytest.raises(RuntimeError, match="shape"):
            op.with_factorization(other.cholesky())
        f = op.with_factorization(op.cholesky())
        rhs = jnp.ones((6, 1), jnp.float64)
        np.testing.assert_allclose(
            np.asarray(f.solve(rhs)),
            np.linalg.solve(np.asarray(op.to_dense()), np.asarray(rhs)),
            rtol=1e-9,
        )

    def test_factored_gradients_flow_to_original_leaves(self):
        """Gradients through a reused factorization reach the base operator's
        leaves, exactly as if factorized inline."""

        def loss_factored(mat):
            op = DenseLinearOperator(mat)
            f = op.cholesky()
            rhs = jnp.ones((6, 1), jnp.float64)
            x = solve(op, rhs, factored=f)
            _, ld = inv_quad_logdet(op, logdet=True, factored=f)
            return jnp.sum(x) + ld

        def loss_plain(mat):
            op = DenseLinearOperator(mat)
            rhs = jnp.ones((6, 1), jnp.float64)
            return jnp.sum(solve(op, rhs)) + op.logdet()

        mat = _psd(jax.random.PRNGKey(3), n=6)
        g1 = jax.grad(loss_factored)(mat)
        g2 = jax.grad(loss_plain)(mat)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------------
# Per-batch CG stopping
# ---------------------------------------------------------------------------


class TestPerBatchCG:
    def test_mixed_conditioning_batch(self):
        """An instantly-converged batch element must not stop the loop for an
        ill-conditioned sibling (reference linear_cg.py:277-295 reduces over
        columns only)."""
        n = 40
        easy = jnp.eye(n, dtype=jnp.float64)
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), dtype=jnp.float64)
        hard = a @ a.T + 1e-2 * jnp.eye(n, dtype=jnp.float64)
        mats = jnp.stack([easy, hard])
        rhs = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3), dtype=jnp.float64)
        result = linear_cg(
            lambda v: mats @ v, rhs, tolerance=1e-8, max_iter=200
        )
        expected = np.linalg.solve(np.asarray(mats), np.asarray(rhs))
        np.testing.assert_allclose(np.asarray(result.solution), expected, rtol=1e-5)


# ---------------------------------------------------------------------------
# Multi-probe Lanczos root_inv_decomposition (VERDICT r1 item 3)
# ---------------------------------------------------------------------------


class TestMultiProbeRootInv:
    def test_selects_best_probe_by_residual(self):
        from linear_operator_tpu.functions import root_inv_decomposition

        n, p = 50, 4
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), dtype=jnp.float64)
        mat = a @ a.T + 0.1 * jnp.eye(n, dtype=jnp.float64)
        op = DenseLinearOperator(mat)
        probes = jax.random.normal(jax.random.PRNGKey(1), (n, p), dtype=jnp.float64)
        tv = jax.random.normal(jax.random.PRNGKey(2), (n, 3), dtype=jnp.float64)

        with settings.max_root_decomposition_size(15):
            multi = root_inv_decomposition(
                op, method="lanczos", initial_vectors=probes, test_vectors=tv
            ).root.to_dense()
            singles, resids = [], []
            for i in range(p):
                ri = root_inv_decomposition(
                    op, method="lanczos", initial_vectors=probes[:, i : i + 1]
                ).root.to_dense()
                singles.append(ri)
                sol = ri @ (ri.T @ tv)
                resids.append(float(jnp.linalg.norm(mat @ sol - tv)))
        best = int(np.argmin(resids))
        np.testing.assert_allclose(
            np.asarray(multi), np.asarray(singles[best]), rtol=1e-10
        )

    def test_multi_probe_accuracy(self):
        """More probes can only help: the selected root's residual is <= the
        first probe's residual."""
        from linear_operator_tpu.functions import root_inv_decomposition

        n = 64
        a = jax.random.normal(jax.random.PRNGKey(3), (n, n), dtype=jnp.float64)
        mat = a @ a.T + 1.0 * jnp.eye(n, dtype=jnp.float64)
        op = DenseLinearOperator(mat)
        probes = jax.random.normal(jax.random.PRNGKey(4), (n, 6), dtype=jnp.float64)

        def resid(r):
            sol = r @ (r.T @ probes)
            return float(jnp.linalg.norm(mat @ sol - probes))

        with settings.max_root_decomposition_size(25):
            multi = root_inv_decomposition(
                op, method="lanczos", initial_vectors=probes
            ).root.to_dense()
            single = root_inv_decomposition(
                op, method="lanczos", initial_vectors=probes[:, :1]
            ).root.to_dense()
        assert resid(multi) <= resid(single) + 1e-9


# ---------------------------------------------------------------------------
# solve_triangular validation
# ---------------------------------------------------------------------------


class TestSolveTriangular:
    def _tri(self, upper=False):
        mat = jnp.tril(_psd(jax.random.PRNGKey(0), n=6))
        if upper:
            mat = mat.T
        return TriangularLinearOperator(DenseLinearOperator(mat), upper=upper)

    def test_upper_mismatch_raises(self):
        with pytest.raises(RuntimeError, match="upper"):
            self._tri(upper=False).solve_triangular(
                jnp.ones((6, 1), jnp.float64), upper=True
            )

    def test_base_class_refuses(self):
        op = DenseLinearOperator(_psd(jax.random.PRNGKey(1), n=4))
        with pytest.raises(NotImplementedError):
            op.solve_triangular(jnp.ones((4, 1), jnp.float64), upper=False)

    def test_left_and_right_solves(self):
        tri = self._tri(upper=False)
        dense = np.asarray(tri.to_dense())
        rhs = np.asarray(
            jax.random.normal(jax.random.PRNGKey(2), (6, 2), dtype=jnp.float64)
        )
        left = tri.solve_triangular(jnp.asarray(rhs), upper=False)
        np.testing.assert_allclose(
            np.asarray(left), np.linalg.solve(dense, rhs), rtol=1e-10
        )
        rhs_t = rhs.T  # (2, 6)
        right = tri.solve_triangular(jnp.asarray(rhs_t), upper=False, left=False)
        np.testing.assert_allclose(
            np.asarray(right), rhs_t @ np.linalg.inv(dense), rtol=1e-8
        )


# ---------------------------------------------------------------------------
# Kernel K-caching closures (VERDICT r1 item 1, materialize_threshold)
# ---------------------------------------------------------------------------


class TestKernelMatmulClosure:
    def _op(self, n=32, threshold=2**30, count=None):
        x = jax.random.normal(jax.random.PRNGKey(0), (n, 3), dtype=jnp.float64)

        def covar(x1, x2, lengthscale, outputscale):
            if count is not None:
                count[0] += 1
            from linear_operator_tpu.operators.kernel import rbf_covar

            return rbf_covar(x1, x2, lengthscale, outputscale)

        return KernelLinearOperator(
            x,
            x,
            {
                "lengthscale": jnp.asarray(1.0, jnp.float64),
                "outputscale": jnp.asarray(1.0, jnp.float64),
            },
            covar_func=covar,
            symmetric=True,
            materialize_threshold=threshold,
        )

    def test_cached_closure_evaluates_kernel_once(self):
        count = [0]
        op = self._op(count=count)
        closure = op._matmul_closure()
        base = count[0]
        v1 = jnp.ones((32, 2), jnp.float64)
        out1 = closure(v1)
        out2 = closure(2.0 * v1)
        assert count[0] == base  # K materialized at closure build, not per call
        np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(out1), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(op._matmul(v1)), rtol=1e-5, atol=1e-7
        )

    def test_threshold_disables_caching(self):
        count = [0]
        op = self._op(threshold=None, count=count)
        closure = op._matmul_closure()
        n_build = count[0]
        closure(jnp.ones((32, 1), jnp.float64))
        closure(jnp.ones((32, 1), jnp.float64))
        assert count[0] > n_build  # streamed per call

    def test_added_diag_composes_caching(self):
        count = [0]
        op = self._op(count=count).add_diagonal(jnp.asarray(0.5, jnp.float64))
        closure = op._matmul_closure()
        base = count[0]
        v = jnp.ones((32, 1), jnp.float64)
        out = closure(v)
        assert count[0] == base
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(op._matmul(v)), rtol=1e-5, atol=1e-7
        )


# ---------------------------------------------------------------------------
# Cat operator depth (VERDICT r1 item 8)
# ---------------------------------------------------------------------------


class TestCatDepth:
    def _cat(self, key=0, sizes=(3, 4, 2), m=6, cat_dim=-2):
        blocks = [
            jax.random.normal(jax.random.PRNGKey(key + i), (s, m), jnp.float64)
            for i, s in enumerate(sizes)
        ]
        if cat_dim == -1:
            blocks = [b.T for b in blocks]
        from linear_operator_tpu.operators import CatLinearOperator

        return (
            CatLinearOperator(
                tuple(DenseLinearOperator(b) for b in blocks), cat_dim=cat_dim
            ),
            jnp.concatenate(blocks, axis=cat_dim),
        )

    def test_strided_slice_stays_lazy(self):
        from linear_operator_tpu.operators import CatLinearOperator

        op, dense = self._cat()
        for sl in [slice(1, 8, 2), slice(0, 9, 3), slice(2, 9), slice(None, None, 4)]:
            res = op[sl, :]
            assert isinstance(res, (CatLinearOperator, DenseLinearOperator))
            np.testing.assert_allclose(
                np.asarray(res.to_dense()), np.asarray(dense[sl]), rtol=1e-12
            )

    def test_col_cat_strided(self):
        from linear_operator_tpu.operators import CatLinearOperator

        op, dense = self._cat(cat_dim=-1)
        res = op[:, slice(1, 9, 2)]
        assert isinstance(res, (CatLinearOperator, DenseLinearOperator))
        np.testing.assert_allclose(
            np.asarray(res.to_dense()), np.asarray(dense[:, 1:9:2]), rtol=1e-12
        )

    def test_get_indices(self):
        op, dense = self._cat()
        i = jnp.array([0, 4, 8, 2])
        j = jnp.array([1, 5, 0, 3])
        np.testing.assert_allclose(
            np.asarray(op._get_indices(i, j)),
            np.asarray(dense[np.asarray(i), np.asarray(j)]),
            rtol=1e-12,
        )

    def test_diagonal_row_cat_lazy(self):
        """Row/col-concat diagonal via per-block gathers, not to_dense."""
        from unittest import mock

        op, dense = self._cat(sizes=(3, 3), m=6)
        with mock.patch.object(
            type(op), "to_dense", side_effect=AssertionError("densified!")
        ):
            diag = op._diagonal()
        np.testing.assert_allclose(
            np.asarray(diag), np.asarray(jnp.diagonal(dense)), rtol=1e-12
        )

    def test_sharded_cat_matmul(self):
        """The reference's multi-GPU CatLinearOperator (output_device block
        scatter, cat_linear_operator.py:306-350): TPU-native equivalent is
        sharding each block's leaves over the mesh and jitting the whole
        matmul — GSPMD inserts the gather."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from linear_operator_tpu.operators import CatLinearOperator

        devices = np.array(jax.devices()[:4])
        mesh = Mesh(devices, ("blocks",))
        m = 8
        blocks = [
            jax.random.normal(jax.random.PRNGKey(i), (4, m), jnp.float64)
            for i in range(4)
        ]
        # each block replicated per device is the trivial layout; shard each
        # block's ROWS over the mesh to emulate block-per-device placement
        sharded = [
            jax.device_put(b, NamedSharding(mesh, P("blocks", None)))
            for b in blocks
        ]
        op = CatLinearOperator(
            tuple(DenseLinearOperator(b) for b in sharded), cat_dim=-2
        )
        v = jax.random.normal(jax.random.PRNGKey(9), (m, 2), jnp.float64)

        out = jax.jit(lambda o, vv: o @ vv)(op, v)
        expected = jnp.concatenate(blocks, axis=0) @ v
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-12)


# ---------------------------------------------------------------------------
# Batched rectangular Pallas mat-vec (ADVICE r1 item 3)
# ---------------------------------------------------------------------------


class TestPallasBatchedRect:
    def test_batched_cross_covariance(self):
        x1 = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 3), dtype=jnp.float32)
        x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 3), dtype=jnp.float32)
        rhs = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 4), dtype=jnp.float32)
        params = {
            "lengthscale": jnp.asarray(1.3, jnp.float32),
            "outputscale": jnp.asarray(0.8, jnp.float32),
        }
        out = rbf_pallas_matvec(x1, x2, rhs, params, symmetric=False)
        from linear_operator_tpu.operators.kernel import rbf_covar

        expected = jnp.einsum(
            "bnm,bmt->bnt", rbf_covar(x1, x2, **params), rhs
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5
        )

    def test_sym_fallback_matches(self):
        from linear_operator_tpu.ops.rbf import rbf_matvec_sym

        x = jax.random.normal(jax.random.PRNGKey(0), (37, 3), dtype=jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(1), (37, 5), dtype=jnp.float32)
        out = rbf_matvec_sym(x, v)
        k = jnp.exp(
            -0.5 * jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(k @ v), rtol=2e-5, atol=2e-5
        )

    def test_sym_backward_matches_dense(self):
        from linear_operator_tpu.ops.rbf import rbf_matvec_sym

        x = jax.random.normal(jax.random.PRNGKey(0), (17, 2), dtype=jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(1), (17, 3), dtype=jnp.float32)

        def f_sym(x, v):
            return jnp.sum(jnp.sin(rbf_matvec_sym(x, v)))

        def f_dense(x, v):
            k = jnp.exp(
                -0.5 * jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
            )
            return jnp.sum(jnp.sin(k @ v))

        gx1, gv1 = jax.grad(f_sym, argnums=(0, 1))(x, v)
        gx2, gv2 = jax.grad(f_dense, argnums=(0, 1))(x, v)
        np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-3, atol=1e-3)


class TestLazyRootAddition:
    """K + RootLinearOperator(structured) must keep the root lazy: the
    reference passes the root operator through add_low_rank
    (_linear_operator.py:2816-2817) — densifying a full-rank structured root
    (e.g. the README composite Kron + Root(Toeplitz) demo) destroys its
    O(n log n) mat-vec."""

    def test_structured_root_stays_lazy(self):
        from linear_operator_tpu.operators import (
            KroneckerProductLinearOperator,
            RootLinearOperator,
            ToeplitzLinearOperator,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        m1 = jax.random.normal(k1, (6, 6))
        m1 = m1 @ m1.T + jnp.eye(6)
        m2 = jax.random.normal(k2, (5, 5))
        m2 = m2 @ m2.T + jnp.eye(5)
        n = 30
        col = jnp.concatenate([jnp.array([2.0]), 0.5 ** jnp.arange(1.0, n)])
        a = KroneckerProductLinearOperator((m1, m2)) + RootLinearOperator(
            ToeplitzLinearOperator(col)
        )
        # the Toeplitz column must still be a (n,) leaf — no (n, n) leaf
        shapes = [l.shape for l in jax.tree_util.tree_leaves(a)]
        assert (n,) in shapes
        assert (n, n) not in shapes
        # and the math is right
        tcol = np.asarray(col)
        t = np.empty((n, n), dtype=np.float64)
        for i in range(n):
            for j in range(n):
                t[i, j] = tcol[abs(i - j)]
        expected = np.kron(np.asarray(m1), np.asarray(m2)) + t @ t.T
        np.testing.assert_allclose(
            np.asarray(a.to_dense()), expected, rtol=1e-8, atol=1e-8
        )
        v = jax.random.normal(jax.random.PRNGKey(8), (n, 2))
        np.testing.assert_allclose(
            np.asarray(a @ v), expected @ np.asarray(v), rtol=1e-7, atol=1e-7
        )

    def test_add_low_rank_array_still_works(self):
        from linear_operator_tpu.operators import DenseLinearOperator

        a = jax.random.normal(jax.random.PRNGKey(9), (8, 8))
        a = DenseLinearOperator(a @ a.T + jnp.eye(8))
        v = jax.random.normal(jax.random.PRNGKey(10), (8, 2))
        s = a.add_low_rank(v)
        np.testing.assert_allclose(
            np.asarray(s.to_dense()),
            np.asarray(a.to_dense() + v @ v.T),
            rtol=1e-8,
            atol=1e-8,
        )


class TestBlockedMatmulGradMemory:
    """The blocked kernel mat-vec must REMATERIALIZE kernel blocks in its
    backward: without jax.checkpoint the lax.map VJP stacks every block's
    matmul residual — i.e. the full (nblocks, block, m) kernel matrix — into
    one allocation (42.6 GB at the N=1e5 bench scale, over HBM)."""

    def test_grad_matches_single_block(self):
        n, d, t = 3000, 3, 2
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
        rhs = jax.random.normal(jax.random.PRNGKey(1), (n, t), dtype=jnp.float32)

        def f(ls, block):
            op = rbf_kernel_operator(
                x,
                lengthscale=ls,
                outputscale=jnp.float32(1.3),
                block_rows=block,
                materialize_threshold=None,
            )
            return jnp.sum(jnp.cos(op._matmul(rhs)))

        g_blocked = jax.grad(f)(jnp.float32(0.7), 512)
        g_single = jax.grad(f)(jnp.float32(0.7), 4096)
        np.testing.assert_allclose(
            np.asarray(g_blocked), np.asarray(g_single), rtol=1e-4
        )

    def test_grad_temp_memory_bounded(self):
        n, d = 3000, 3
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
        rhs = jax.random.normal(jax.random.PRNGKey(1), (n, 1), dtype=jnp.float32)

        def loss(ls):
            op = rbf_kernel_operator(
                x,
                lengthscale=ls,
                outputscale=jnp.float32(1.0),
                block_rows=256,
                materialize_threshold=None,
            )
            return jnp.sum(op._matmul(rhs))

        compiled = jax.jit(jax.grad(loss)).lower(jnp.float32(0.7)).compile()
        temp = compiled.memory_analysis().temp_size_in_bytes
        full_k_bytes = n * n * 4
        assert temp < full_k_bytes // 2, (
            f"blocked-matmul grad allocates {temp} temp bytes — the lax.map "
            f"VJP is stacking kernel blocks (full K = {full_k_bytes})"
        )
