"""Golden-model property-test harness for operators.

Reference: linear_operator/test/linear_operator_test_case.py:23-1286.
Subclasses define ``create_linear_op()`` (a structured operator whose leaves
carry gradients) and ``evaluate_linear_op(op)`` (dense ground truth computed
straight from the leaves with plain jnp) and inherit every test below: each
public operation is checked against the dense computation — forward values
AND gradients of all representation leaves — within a per-operation tolerance
table (reference :516-535).

Algorithm-routing assertions (reference :555-567 uses MagicMock around
linear_cg) are done with ``unittest.mock.patch`` around
``linear_operator_tpu.solvers.linear_cg.linear_cg`` plus settings context
managers that force each dispatch path.
"""

from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from .. import settings
from ..operators import LinearOperator
from .base_test_case import BaseTestCase


class RectangularLinearOperatorTestCase(BaseTestCase):
    # knobs (reference :511-515)
    should_test_getitem_tensor_index = True

    # The harness classes are abstract: pytest must not collect them (they
    # are imported into every downstream test module).  __init_subclass__
    # re-enables collection exactly for subclasses that implement
    # create_linear_op — no skip noise, no boilerplate in test files.
    __test__ = False

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        cls.__test__ = (
            cls.create_linear_op
            is not RectangularLinearOperatorTestCase.create_linear_op
        )

    tolerances = {
        "matmul": {"rtol": 1e-5, "atol": 1e-6},
        "grad": {"rtol": 1e-4, "atol": 1e-6},
        "solve": {"rtol": 1e-4, "atol": 1e-5},
        "solve_grad": {"rtol": 5e-3, "atol": 1e-4},
        "inv_quad": {"rtol": 1e-3, "atol": 1e-4},
        "logdet": {"rtol": 2e-1, "atol": 1e-1},
        "logdet_grad": {"rtol": 1e-1, "atol": 2.5e-1},
        "root_decomposition": {"rtol": 5e-2, "atol": 1e-3},
        "root_inv_decomposition": {"rtol": 2e-2, "atol": 1e-2},
        "sqrt_inv_matmul": {"rtol": 1e-2, "atol": 1e-2},
        "diagonalization": {"rtol": 5e-2, "atol": 1e-3},
        "sample": {"rtol": 3e-1, "atol": 3e-1},
        "cholesky": {"rtol": 1e-4, "atol": 1e-5},
        "getitem": {"rtol": 1e-5, "atol": 1e-6},
    }

    def create_linear_op(self) -> LinearOperator:
        raise NotImplementedError

    def evaluate_linear_op(self, op: LinearOperator) -> jax.Array:
        raise NotImplementedError

    # -- helpers ----------------------------------------------------------

    def _grad_check(
        self, op, fn_lazy, fn_dense, name="grad", tol_key="grad",
        scale_invariant=False,
    ):
        """Compare d fn_lazy(op) / d leaves against d fn_dense(dense(op)).

        ``scale_invariant`` normalizes each leaf gradient by its max magnitude
        before comparing — used for stochastic (SLQ) gradients whose Monte
        Carlo error scales with the gradient magnitude.

        fn_dense must avoid ``jnp.linalg.eigh``: its VJP is defined only on
        the symmetric subspace (it reads one triangle), so its per-leaf
        gradients are incomparable to exact unconstrained VJPs whenever
        leaves enter K asymmetrically (kernel x1/x2, interp left/right) —
        use solve/slogdet-based dense references, or a finite-difference
        check of the lazy function itself (test_sqrt_inv_matmul_grad)."""
        leaves, treedef = jax.tree_util.tree_flatten(op)

        def f(leaves_):
            return fn_lazy(jax.tree_util.tree_unflatten(treedef, leaves_))

        def g(leaves_):
            o = jax.tree_util.tree_unflatten(treedef, leaves_)
            return fn_dense(self.evaluate_linear_op(o))

        grads_actual = jax.grad(f, allow_int=True)(leaves)
        grads_expected = jax.grad(g, allow_int=True)(leaves)
        tol = self.tolerances[tol_key]
        for i, (ga, ge) in enumerate(zip(grads_actual, grads_expected)):
            if not jnp.issubdtype(jnp.asarray(leaves[i]).dtype, jnp.inexact):
                continue  # integer leaves (indices, permutations) have no grads
            if scale_invariant:
                scale = jnp.maximum(jnp.max(jnp.abs(ge)), 1e-12)
                ga, ge = ga / scale, ge / scale
            self.assertAllClose(ga, ge, msg=f"{name}: leaf {i}", **tol)

    def _rand_rhs(self, op, ncols=None, batch=()):
        shape = (*batch, op.shape[-1]) if ncols is None else (*batch, op.shape[-1], ncols)
        return jax.random.normal(self.key, shape, dtype=op.dtype)

    # -- shape / dtype / dense -------------------------------------------

    def test_to_dense(self):
        op = self.create_linear_op()
        self.assertAllClose(
            op.to_dense(), self.evaluate_linear_op(op), **self.tolerances["matmul"]
        )

    def test_shape(self):
        op = self.create_linear_op()
        self.assertEqual(tuple(op.shape), tuple(self.evaluate_linear_op(op).shape))
        self.assertEqual(op.ndim, len(op.shape))
        self.assertEqual(op.matrix_shape, op.shape[-2:])
        self.assertEqual(op.batch_shape, op.shape[:-2])

    def test_representation_roundtrip(self):
        op = self.create_linear_op()
        leaves, treedef = jax.tree_util.tree_flatten(op)
        op2 = jax.tree_util.tree_unflatten(treedef, leaves)
        self.assertAllClose(op2.to_dense(), op.to_dense(), rtol=0, atol=0)

    # -- matmul -----------------------------------------------------------

    def test_matmul_vec(self):
        op = self.create_linear_op()
        if op.batch_shape:
            return  # vector matmul on batched ops covered by matrix case
        dense = self.evaluate_linear_op(op)
        v = jax.random.normal(self.key, (op.shape[-1],), dtype=op.dtype)
        self.assertAllClose(op @ v, dense @ v, **self.tolerances["matmul"])

    def test_matmul_mat(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        rhs = self._rand_rhs(op, ncols=4)
        self.assertAllClose(op @ rhs, dense @ rhs, **self.tolerances["matmul"])
        self._grad_check(
            op,
            lambda o: jnp.sum(jnp.sin(o @ rhs)),
            lambda d: jnp.sum(jnp.sin(d @ rhs)),
            name="matmul",
        )

    def test_matmul_mat_broadcast(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        rhs = jax.random.normal(
            self.key, (3, *op.batch_shape, op.shape[-1], 2), dtype=op.dtype
        )
        self.assertAllClose(op @ rhs, dense @ rhs, **self.tolerances["matmul"])

    def test_rmatmul(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        lhs = jax.random.normal(
            self.key, (*op.batch_shape, 4, op.shape[-2]), dtype=op.dtype
        )
        self.assertAllClose(op.rmatmul(lhs), lhs @ dense, **self.tolerances["matmul"])

    def test_t_matmul(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        rhs = jax.random.normal(
            self.key, (*op.batch_shape, op.shape[-2], 3), dtype=op.dtype
        )
        self.assertAllClose(
            op._t_matmul(rhs),
            jnp.swapaxes(dense, -1, -2) @ rhs,
            **self.tolerances["matmul"],
        )

    def test_transpose(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        self.assertAllClose(
            op.mT.to_dense(), jnp.swapaxes(dense, -1, -2), **self.tolerances["matmul"]
        )

    # -- arithmetic -------------------------------------------------------

    def test_add_dense(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        other = jax.random.normal(self.key, op.shape, dtype=op.dtype)
        self.assertAllClose(
            (op + other).to_dense(), dense + other, **self.tolerances["matmul"]
        )

    def test_add_self(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        self.assertAllClose(
            (op + op).to_dense(), dense * 2, **self.tolerances["matmul"]
        )

    def test_scalar_mul_div(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        self.assertAllClose((op * 3.0).to_dense(), dense * 3.0, **self.tolerances["matmul"])
        self.assertAllClose((op / 2.0).to_dense(), dense / 2.0, **self.tolerances["matmul"])
        self.assertAllClose((-op).to_dense(), -dense, **self.tolerances["matmul"])
        # negative constants too (reference test_constant_mul_neg)
        self.assertAllClose(
            (op * -1.7).to_dense(), dense * -1.7, **self.tolerances["matmul"]
        )

    def test_sub(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        other = jax.random.normal(self.key, op.shape, dtype=op.dtype)
        self.assertAllClose(
            (op - other).to_dense(), dense - other, **self.tolerances["matmul"]
        )

    # -- indexing ---------------------------------------------------------

    def test_getitem_slices(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        n_rows, n_cols = op.matrix_shape
        sl = (Ellipsis, slice(0, max(n_rows // 2, 1)), slice(None))
        res = op[sl]
        res = res.to_dense() if isinstance(res, LinearOperator) else res
        self.assertAllClose(res, dense[sl], **self.tolerances["getitem"])
        sl2 = (Ellipsis, slice(None), slice(1, n_cols))
        res2 = op[sl2]
        res2 = res2.to_dense() if isinstance(res2, LinearOperator) else res2
        self.assertAllClose(res2, dense[sl2], **self.tolerances["getitem"])

    def test_getitem_int_row(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        res = op[..., 1, :]
        res = res.to_dense() if isinstance(res, LinearOperator) else res
        self.assertAllClose(res, dense[..., 1, :], **self.tolerances["getitem"])

    def test_getitem_int_both(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        res = op[..., 1, 2]
        res = res.to_dense() if isinstance(res, LinearOperator) else res
        self.assertAllClose(res, dense[..., 1, 2], **self.tolerances["getitem"])

    def test_getitem_tensor_index(self):
        if not self.should_test_getitem_tensor_index:
            return
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        i = jnp.array([0, 1, 1])
        j = jnp.array([1, 0, 2])
        res = op[..., i, j]
        res = res.to_dense() if isinstance(res, LinearOperator) else res
        self.assertAllClose(res, dense[..., i, j], **self.tolerances["getitem"])

    def test_getitem_batch(self):
        op = self.create_linear_op()
        if not op.batch_shape:
            return
        dense = self.evaluate_linear_op(op)
        res = op[0]
        res = res.to_dense() if isinstance(res, LinearOperator) else res
        self.assertAllClose(res, dense[0], **self.tolerances["getitem"])

    # -- batch-dim manipulation ------------------------------------------

    def test_unsqueeze(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        self.assertAllClose(
            op.unsqueeze(0).to_dense(), dense[None], **self.tolerances["matmul"]
        )

    def test_expand(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        import warnings as _warnings

        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")
            expanded = op.expand(3, *op.shape)
        self.assertAllClose(
            expanded.to_dense(),
            jnp.broadcast_to(dense, (3, *dense.shape)),
            **self.tolerances["matmul"],
        )

    def test_repeat(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        repeated = op.repeat(2, *([1] * op.ndim))
        self.assertAllClose(
            repeated.to_dense(),
            jnp.tile(dense, (2, *([1] * op.ndim))),
            **self.tolerances["matmul"],
        )

    def test_sum_batch_dim(self):
        op = self.create_linear_op()
        if not op.batch_shape:
            return
        dense = self.evaluate_linear_op(op)
        summed = op.sum(0)
        res = summed.to_dense() if isinstance(summed, LinearOperator) else summed
        self.assertAllClose(res, jnp.sum(dense, axis=0), **self.tolerances["matmul"])

    def test_prod_batch_dim(self):
        """Elementwise product over a batch dim (reference ``prod``,
        :2010-2040 + test :628+)."""
        op = self.create_linear_op()
        if not op.batch_shape:
            return
        dense = self.evaluate_linear_op(op)
        prod = op.prod(0)
        res = prod.to_dense() if isinstance(prod, LinearOperator) else prod
        self.assertAllClose(res, jnp.prod(dense, axis=0), **self.tolerances["matmul"])

    def test_permute_batch(self):
        op = self.create_linear_op()
        if len(op.batch_shape) < 2:
            return
        dense = self.evaluate_linear_op(op)
        nb = len(op.batch_shape)
        perm = tuple(reversed(range(nb)))
        res = op.permute(*perm, nb, nb + 1)
        res = res.to_dense() if isinstance(res, LinearOperator) else res
        self.assertAllClose(
            res,
            jnp.transpose(dense, (*perm, nb, nb + 1)),
            **self.tolerances["matmul"],
        )

    def test_getitem_batch_tensor_index(self):
        """Tensor index on a batch dim with lazy matrix dims (reference
        linear_operator_test_case.py:153-362 broadcast tensor-index cases)."""
        op = self.create_linear_op()
        if not op.batch_shape:
            return
        dense = self.evaluate_linear_op(op)
        idx = jnp.array([0, op.batch_shape[0] - 1])
        res = op[idx]
        res = res.to_dense() if isinstance(res, LinearOperator) else res
        self.assertAllClose(res, dense[idx], **self.tolerances["getitem"])

    def test_getitem_matrix_tensor_row_lazy(self):
        """1-D tensor index on the row dim stays LAZY and matches dense
        (reference _linear_operator.py:303-313 Interpolated selection)."""
        if not self.should_test_getitem_tensor_index:
            return
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        idx = jnp.array([0, min(2, op.shape[-2] - 1), 1])
        res = op[..., idx, :]
        self.assertIsInstance(res, LinearOperator)
        self.assertAllClose(
            res.to_dense(), dense[..., idx, :], **self.tolerances["getitem"]
        )
        # and through a mat-vec without densifying
        v = jax.random.normal(
            self.key, (*op.batch_shape, op.shape[-1], 2), dtype=op.dtype
        )
        self.assertAllClose(
            res @ v, dense[..., idx, :] @ v, **self.tolerances["matmul"]
        )

    def test_pickle(self):
        """Pickle round-trip (reference linear_operator_test_case.py:973-981)
        — the reference's only persistence mechanism; operators here are
        frozen pytree dataclasses, so serialization must be loss-free."""
        import pickle

        op = self.create_linear_op()
        unpickled = pickle.loads(pickle.dumps(op))
        self.assertIsInstance(unpickled, type(op))
        self.assertAllClose(
            unpickled.to_dense(), op.to_dense(), rtol=1e-14, atol=1e-14
        )
        # pytree structure survives too (jit caching relies on the treedef)
        self.assertEqual(
            jax.tree_util.tree_structure(op),
            jax.tree_util.tree_structure(unpickled),
        )

    def test_detach_astype(self):
        op = self.create_linear_op()
        detached = op.detach()
        self.assertAllClose(detached.to_dense(), op.to_dense(), rtol=0, atol=0)
        f32 = op.astype(jnp.float32)
        self.assertEqual(f32.dtype, jnp.float32)

    def test_dtype_roundtrip(self):
        """float()/double()/astype round-trips preserve values (reference
        ``to``/``float``/``double`` tests, :2606-2631)."""
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        f32 = op.float()
        self.assertEqual(f32.dtype, jnp.float32)
        back = f32.double() if op.dtype == jnp.float64 else f32.astype(op.dtype)
        self.assertEqual(back.dtype, op.dtype)
        self.assertAllClose(
            back.to_dense().astype(op.dtype),
            dense.astype(jnp.float32).astype(op.dtype),
            rtol=1e-6,
            atol=1e-6,
        )

    def test_isclose(self):
        op = self.create_linear_op()
        self.assertTrue(bool(jnp.all(op.isclose(self.evaluate_linear_op(op)))))


class LinearOperatorTestCase(RectangularLinearOperatorTestCase):
    """Additional tests for square PSD operators (reference :510-1286)."""

    should_test_sample = True
    should_call_cg = True
    should_call_lanczos = True
    skip_slq_tests = False

    # -- structure --------------------------------------------------------

    def test_diagonal(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        self.assertAllClose(
            op.diagonal(),
            jnp.diagonal(dense, axis1=-2, axis2=-1),
            **self.tolerances["matmul"],
        )

    def test_add_jitter(self):
        # reference harness test_add_jitter (linear_operator_test_case.py)
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        eye = jnp.eye(op.shape[-1], dtype=op.dtype)
        self.assertAllClose(
            op.add_jitter(0.4).to_dense(), dense + 0.4 * eye,
            **self.tolerances["matmul"],
        )

    def test_add_diagonal(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        d = jnp.abs(jax.random.normal(self.key, (op.shape[-1],), dtype=op.dtype)) + 1.0
        self.assertAllClose(
            op.add_diagonal(d).to_dense(),
            dense + jnp.diag(d),
            **self.tolerances["matmul"],
        )
        self.assertAllClose(
            op.add_jitter(0.5).to_dense(),
            dense + 0.5 * jnp.eye(op.shape[-1], dtype=op.dtype),
            **self.tolerances["matmul"],
        )

    def test_add_low_rank(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        v = jax.random.normal(self.key, (*op.batch_shape, op.shape[-1], 2), dtype=op.dtype)
        self.assertAllClose(
            op.add_low_rank(v).to_dense(),
            dense + v @ jnp.swapaxes(v, -1, -2),
            **self.tolerances["matmul"],
        )

    # -- factorization ----------------------------------------------------

    def test_cholesky(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        L = op.cholesky()
        self.assertAllClose(
            L.to_dense() @ jnp.swapaxes(L.to_dense(), -1, -2),
            dense,
            **self.tolerances["cholesky"],
        )

    def test_root_decomposition_exact(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        with settings.fast_computations(covar_root_decomposition=False):
            root_op = op.root_decomposition()
        root = root_op.root.to_dense()
        self.assertAllClose(
            root @ jnp.swapaxes(root, -1, -2), dense, **self.tolerances["cholesky"]
        )

    def test_root_decomposition_lanczos(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        from ..solvers import lanczos as lanczos_module

        with settings.max_cholesky_size(0):
            with mock.patch(
                "linear_operator_tpu.solvers.lanczos.lanczos_tridiag",
                wraps=lanczos_module.lanczos_tridiag,
            ) as lanczos_mock:
                root_op = op.root_decomposition(key=self.key)
                if self.should_call_lanczos and op._root_structure() is None:
                    self.assertTrue(
                        lanczos_mock.called, "expected Lanczos to be invoked"
                    )
        root = root_op.root.to_dense()
        self.assertAllClose(
            root @ jnp.swapaxes(root, -1, -2),
            dense,
            **self.tolerances["root_decomposition"],
        )

    def test_root_inv_decomposition(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        # multi-probe Lanczos + best-of-probes residual selection (reference
        # utils/lanczos.py:9-223) — lets the tolerance sit at the
        # reference's 2e-2 instead of single-probe luck.
        probes = jax.random.normal(
            self.key, (*op.batch_shape, op.shape[-1], 3), dtype=op.dtype
        )
        inv_root_op = op.root_inv_decomposition(
            initial_vectors=probes, key=self.key
        )
        inv_root = inv_root_op.root.to_dense()
        self.assertAllClose(
            inv_root @ jnp.swapaxes(inv_root, -1, -2),
            jnp.linalg.inv(dense),
            **self.tolerances["root_inv_decomposition"],
        )

    def test_diagonalization(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        evals, evecs = op.diagonalization()
        evecs = evecs.to_dense() if isinstance(evecs, LinearOperator) else evecs
        recon = jnp.einsum(
            "...ij,...j,...kj->...ik", evecs, evals, evecs
        )
        self.assertAllClose(recon, dense, **self.tolerances["diagonalization"])

    def test_eigvalsh(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        self.assertAllClose(
            op.eigvalsh(), jnp.linalg.eigvalsh(dense), **self.tolerances["matmul"]
        )

    def test_svd(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        U, S, V = op.svd()
        recon = U.to_dense() * S[..., None, :] @ jnp.swapaxes(V.to_dense(), -1, -2)
        self.assertAllClose(recon, dense, **self.tolerances["cholesky"])

    def test_pivoted_cholesky(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        n = op.shape[-1]
        L = op.pivoted_cholesky(rank=n, error_tol=0.0)
        self.assertAllClose(
            L @ jnp.swapaxes(L, -1, -2), dense, rtol=1e-3, atol=1e-3
        )

    # -- solves -----------------------------------------------------------

    def test_solve_vec_cholesky(self):
        op = self.create_linear_op()
        if op.batch_shape:
            return
        dense = self.evaluate_linear_op(op)
        b = jax.random.normal(self.key, (op.shape[-1],), dtype=op.dtype)
        with settings.fast_computations(solves=False):
            x = op.solve(b)
        self.assertAllClose(x, jnp.linalg.solve(dense, b), **self.tolerances["solve"])

    def test_solve_mat_cholesky(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = self._rand_rhs(op, ncols=3, batch=op.batch_shape)
        with settings.fast_computations(solves=False):
            x = op.solve(b)
        self.assertAllClose(x, jnp.linalg.solve(dense, b), **self.tolerances["solve"])
        self._grad_check(
            op,
            lambda o: jnp.sum(jnp.sin(o.solve(b))),
            lambda d: jnp.sum(jnp.sin(jnp.linalg.solve(d, b))),
            name="solve_chol",
            tol_key="solve_grad",
        )

    def test_solve_mat_cg(self):
        if not self.should_call_cg:
            return
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = self._rand_rhs(op, ncols=3, batch=op.batch_shape)
        from ..solvers import linear_cg as cg_fn

        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-8), \
             settings.max_cg_iterations(2000):
            with mock.patch(
                "linear_operator_tpu.solvers.linear_cg.linear_cg", wraps=cg_fn
            ) as cg_mock:
                x = op.solve(b)
                structural = op._solve_structure(b)
                if structural is None:
                    self.assertTrue(cg_mock.called, "expected CG to be invoked")
        self.assertAllClose(x, jnp.linalg.solve(dense, b), **self.tolerances["solve"])
        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
             settings.max_cg_iterations(2000):
            self._grad_check(
                op,
                lambda o: jnp.sum(jnp.sin(o.solve(b))),
                lambda d: jnp.sum(jnp.sin(jnp.linalg.solve(d, b))),
                name="solve_cg",
                tol_key="solve_grad",
            )

    def test_solve_mat_broadcast_rhs(self):
        """solve with an EXTRA leading rhs batch dim broadcasts against the
        operator's own batch shape, on both the Cholesky and the CG path
        (reference semantics: torch.linalg/cholesky_solve broadcast;
        regression for the unbatched-factor/batched-rhs triangular solve)."""
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = jax.random.normal(
            self.key, (2, *op.batch_shape, op.shape[-1], 3), dtype=op.dtype
        )
        with settings.fast_computations(solves=False):
            x = op.solve(b)
        self.assertAllClose(x, jnp.linalg.solve(dense, b), **self.tolerances["solve"])
        if self.should_call_cg:
            with settings.max_cholesky_size(0), settings.cg_tolerance(1e-8), \
                 settings.max_cg_iterations(2000):
                x = op.solve(b)
            self.assertAllClose(
                x, jnp.linalg.solve(dense, b), **self.tolerances["solve"]
            )

    def test_solve_with_lhs(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = self._rand_rhs(op, ncols=3, batch=op.batch_shape)
        lhs = jax.random.normal(
            self.key, (*op.batch_shape, 2, op.shape[-1]), dtype=op.dtype
        )
        with settings.fast_computations(solves=False):
            x = op.solve(b, lhs)
        self.assertAllClose(
            x, lhs @ jnp.linalg.solve(dense, b), **self.tolerances["solve"]
        )

    # -- inv_quad_logdet --------------------------------------------------

    def test_inv_quad_logdet_cholesky(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = self._rand_rhs(op, ncols=3, batch=op.batch_shape)
        with settings.fast_computations(log_prob=False, solves=False):
            iq, ld = op.inv_quad_logdet(b, logdet=True)
        iq_true = jnp.sum(jnp.linalg.solve(dense, b) * b, axis=(-2, -1))
        ld_true = jnp.linalg.slogdet(dense)[1]
        self.assertAllClose(iq, iq_true, **self.tolerances["inv_quad"])
        self.assertAllClose(ld, ld_true, rtol=1e-3, atol=1e-3)
        with settings.fast_computations(log_prob=False, solves=False):
            self._grad_check(
                op,
                # one call for both outputs: a second identical call would
                # re-run the full forward+VJP under jax.grad (no CSE outside
                # jit) — these are the heaviest tests in the suite
                lambda o: (lambda r: jnp.sum(r[0]) + jnp.sum(r[1]))(
                    o.inv_quad_logdet(b, logdet=True)
                ),
                lambda d: jnp.sum(jnp.sum(jnp.linalg.solve(d, b) * b, axis=(-2, -1)))
                + jnp.sum(jnp.linalg.slogdet(d)[1]),
                name="iqld_chol",
                tol_key="solve_grad",
            )

    def test_inv_quad_logdet_stochastic(self):
        if self.skip_slq_tests:
            return
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = self._rand_rhs(op, ncols=3, batch=op.batch_shape)
        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-8), \
             settings.max_cg_iterations(2000), settings.num_trace_samples(128), \
             settings.max_lanczos_quadrature_iterations(64):
            iq, ld = op.inv_quad_logdet(b, logdet=True, key=self.key)
        iq_true = jnp.sum(jnp.linalg.solve(dense, b) * b, axis=(-2, -1))
        ld_true = jnp.linalg.slogdet(dense)[1]
        self.assertAllClose(iq, iq_true, **self.tolerances["inv_quad"])
        self.assertAllClose(ld, ld_true, **self.tolerances["logdet"])

    def test_inv_quad_logdet_stochastic_grad(self):
        if self.skip_slq_tests:
            return
        op = self.create_linear_op()
        b = self._rand_rhs(op, ncols=3, batch=op.batch_shape)
        key = self.key
        # SLQ gradients are Hutchinson estimates: abs error ~ ||grad|| / sqrt(m),
        # so the check needs a large probe count (reference inflates samples
        # the same way, linear_operator_test_case.py:557-562).
        with settings.max_cholesky_size(0), settings.cg_tolerance(1e-10), \
             settings.max_cg_iterations(2000), settings.num_trace_samples(4096), \
             settings.max_lanczos_quadrature_iterations(64):
            self._grad_check(
                op,
                # one call for both outputs (see test_inv_quad_logdet_cholesky)
                lambda o: (lambda r: jnp.sum(r[0] + r[1]))(
                    o.inv_quad_logdet(b, logdet=True, key=key)
                ),
                lambda d: jnp.sum(
                    jnp.sum(jnp.linalg.solve(d, b) * b, axis=(-2, -1))
                    + jnp.linalg.slogdet(d)[1]
                ),
                name="iqld_slq",
                tol_key="logdet_grad",
                scale_invariant=True,
            )

    def test_logdet(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        with settings.fast_computations(log_prob=False):
            ld = op.logdet()
        self.assertAllClose(ld, jnp.linalg.slogdet(dense)[1], rtol=1e-3, atol=1e-3)

    def test_inv_quad_no_reduce(self):
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = self._rand_rhs(op, ncols=3, batch=op.batch_shape)
        with settings.fast_computations(log_prob=False, solves=False):
            iq = op.inv_quad(b, reduce_inv_quad=False)
        iq_true = jnp.sum(jnp.linalg.solve(dense, b) * b, axis=-2)
        self.assertAllClose(iq, iq_true, **self.tolerances["inv_quad"])

    # -- derived operators -------------------------------------------------

    def test_mul_with_operator(self):
        """Hadamard product with another operator (reference ``mul``,
        :1881-1917 and MulLinearOperator tests)."""
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        with settings.fast_computations(covar_root_decomposition=False):
            prod = op.mul(op)
            res = prod.to_dense() if isinstance(prod, LinearOperator) else prod
        self.assertAllClose(res, dense * dense, rtol=1e-3, atol=1e-3)

    def test_add_low_rank_with_roots(self):
        """Roots are UPDATED when the operator carries one — a root-seeded
        operator returns a ROOTED sum whose root reconstructs K + V V^T (the
        reference's cache seeding, :1139-1140) — and are never speculatively
        created (gate per reference :1079-1080)."""
        from ..operators.root import RootLinearOperator

        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        v = jax.random.normal(
            self.key, (*op.batch_shape, op.shape[-1], 2), dtype=op.dtype
        )
        with settings.fast_computations(covar_root_decomposition=False):
            rooted_op = op.with_factorization(op.root_decomposition())
            updated = rooted_op.add_low_rank(v)
        self.assertIsInstance(updated, RootLinearOperator)
        root = updated.root.to_dense()
        self.assertAllClose(
            root @ jnp.swapaxes(root, -1, -2),
            dense + v @ jnp.swapaxes(v, -1, -2),
            **self.tolerances["root_decomposition"],
        )

    def test_cat_rows(self):
        """Online row/col append (reference ``cat_rows``, :1152-1308):
        the result equals the dense block matrix, and with generate_roots
        its root reconstructs it."""
        from ..operators.root import RootLinearOperator

        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        m = 2
        B = jax.random.normal(
            self.key, (*op.batch_shape, op.shape[-1], m), dtype=op.dtype
        ) * 0.1
        with settings.fast_computations(solves=False):
            KinvB = op.solve(B)
        C = jnp.swapaxes(B, -1, -2) @ KinvB + jnp.eye(m, dtype=op.dtype)
        block = jnp.concatenate(
            [
                jnp.concatenate([dense, B], axis=-1),
                jnp.concatenate([jnp.swapaxes(B, -1, -2), C], axis=-1),
            ],
            axis=-2,
        )
        Bt = jnp.swapaxes(B, -1, -2)  # cross_mat = the NEW ROWS (m, n)
        with settings.fast_computations(covar_root_decomposition=False, solves=False):
            lazy = op.cat_rows(Bt, C, generate_roots=False)
            self.assertAllClose(
                lazy.to_dense(), block, **self.tolerances["matmul"]
            )
            # roots are only UPDATED, never speculatively created (reference
            # :1265-1272): seed one first, then append.
            rooted = op.with_factorization(op.root_decomposition()).cat_rows(Bt, C)
        self.assertIsInstance(rooted, RootLinearOperator)
        root = rooted.root.to_dense()
        self.assertAllClose(
            root @ jnp.swapaxes(root, -1, -2),
            block,
            **self.tolerances["root_decomposition"],
        )

    def test_sqrt_inv_matmul_grad(self):
        """Gradient of K^{-1/2} rhs: the CIQ custom VJP must be the exact
        gradient of the (converged) quadrature forward.  Checked as a
        central finite difference along a random leaf direction — a dense
        eigh reference would impose eigh's symmetrized-cotangent convention,
        which is undefined per-leaf for operators whose leaves enter K
        asymmetrically (interp left/right values, kernel x1/x2).  The
        reference backprops sqrt_inv_matmul against torch autograd the same
        way in spirit (test :1155-1220; torch never observes per-leaf splits
        because aliased roles share one tensor)."""
        op = self.create_linear_op()
        if op.batch_shape:
            return  # reference also skips batched sqrt_inv grads (:1157)
        rhs = self._rand_rhs(op, ncols=2)
        leaves, treedef = jax.tree_util.tree_flatten(op)

        def f(leaves_):
            o = jax.tree_util.tree_unflatten(treedef, leaves_)
            return jnp.sum(o.sqrt_inv_matmul(rhs))

        # settings AROUND jax.grad, not inside f: the custom_vjp backward is
        # traced after f's body exits (docs/settings.md, tracing pitfall), so
        # an inner context would leave the backward MINRES at defaults.
        with settings.minres_tolerance(1e-13), settings.num_contour_quadrature(31):
            grads = jax.grad(f, allow_int=True)(leaves)
        key = self.key
        tangent = []
        for leaf in leaves:
            leaf = jnp.asarray(leaf)
            if jnp.issubdtype(leaf.dtype, jnp.inexact):
                key, sub = jax.random.split(key)
                tangent.append(jax.random.normal(sub, leaf.shape, leaf.dtype))
            else:
                tangent.append(jnp.zeros_like(leaf))
        eps = 1e-5

        def shift(l, t, sign):
            l = jnp.asarray(l)
            if not jnp.issubdtype(l.dtype, jnp.inexact):
                return l  # integer leaves (indices) stay exact
            return l + sign * eps * t

        plus = [shift(l, t, +1) for l, t in zip(leaves, tangent)]
        minus = [shift(l, t, -1) for l, t in zip(leaves, tangent)]
        with settings.minres_tolerance(1e-13), settings.num_contour_quadrature(31):
            fd = (f(plus) - f(minus)) / (2 * eps)
        dot = sum(
            jnp.vdot(g, t)
            for g, t in zip(grads, tangent)
            if jnp.issubdtype(jnp.asarray(g).dtype, jnp.inexact)
        )
        self.assertAllClose(dot, fd, **self.tolerances["sqrt_inv_matmul"])

    def test_sqrt_inv_matmul(self):
        """K^{-1/2} rhs via contour-integral quadrature (reference
        ``sqrt_inv_matmul``, :2422-2466; test :628+)."""
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        rhs = self._rand_rhs(op, ncols=2, batch=op.batch_shape)
        evals, evecs = jnp.linalg.eigh(dense)
        inv_sqrt_dense = (evecs / jnp.sqrt(evals)[..., None, :]) @ jnp.swapaxes(
            evecs, -1, -2
        )
        with settings.minres_tolerance(1e-10), settings.num_contour_quadrature(31):
            res = op.sqrt_inv_matmul(rhs)
        self.assertAllClose(
            res, inv_sqrt_dense @ rhs, **self.tolerances["sqrt_inv_matmul"]
        )
        lhs = jax.random.normal(
            self.key, (*op.batch_shape, 2, op.shape[-1]), dtype=op.dtype
        )
        with settings.minres_tolerance(1e-10), settings.num_contour_quadrature(31):
            sqrt_inv, inv_quad = op.sqrt_inv_matmul(rhs, lhs)
        self.assertAllClose(
            sqrt_inv, lhs @ inv_sqrt_dense @ rhs, **self.tolerances["sqrt_inv_matmul"]
        )
        # the second output is the row-wise lhs K^{-1} lhs^T quadratic form
        # (reference _linear_operator.py:2422-2466 checks both outputs)
        inv_dense = jnp.linalg.inv(dense)
        self.assertAllClose(
            inv_quad,
            jnp.einsum("...ij,...jk,...ik->...i", lhs, inv_dense, lhs),
            **self.tolerances["sqrt_inv_matmul"],
        )

    def test_prod_lazy(self):
        """Root-based divide-and-conquer prod (reference ``_prod_batch``,
        :635-688) stays lazy and matches the dense product for PSD batches."""
        op = self.create_linear_op()
        if not op.batch_shape:
            return
        dense = self.evaluate_linear_op(op)
        res = op.prod(0, lazy=True)
        self.assertIsInstance(res, LinearOperator)
        self.assertAllClose(
            res.to_dense(), jnp.prod(dense, axis=0), **self.tolerances["root_decomposition"]
        )

    def test_factored_reuse(self):
        """solve/inv_quad_logdet with ``factored=`` (the functional memoize
        cache, utils/memoize.py analog) match the dense ground truth."""
        op = self.create_linear_op()
        dense = self.evaluate_linear_op(op)
        b = self._rand_rhs(op, ncols=2, batch=op.batch_shape)
        with settings.fast_computations(solves=False, log_prob=False):
            f = op.cholesky()
            x = op.solve(b, factored=f)
            iq, ld = op.inv_quad_logdet(b, logdet=True, factored=f)
        self.assertAllClose(
            x, jnp.linalg.solve(dense, b), **self.tolerances["solve"]
        )
        self.assertAllClose(
            iq,
            jnp.sum(jnp.linalg.solve(dense, b) * b, axis=(-2, -1)),
            **self.tolerances["inv_quad"],
        )
        self.assertAllClose(ld, jnp.linalg.slogdet(dense)[1], rtol=1e-3, atol=1e-3)

    # -- algorithm routing (negative asserts, reference :598-627) ---------

    def test_no_cg_below_cutoff(self):
        """Below max_cholesky_size (or with fast solves off) CG must NOT
        run (reference should_call_cg=False asserts)."""
        op = self.create_linear_op()
        b = self._rand_rhs(op, ncols=2, batch=op.batch_shape)
        from ..solvers import linear_cg as cg_fn

        with settings.fast_computations(solves=False, log_prob=False):
            with mock.patch(
                "linear_operator_tpu.solvers.linear_cg.linear_cg", wraps=cg_fn
            ) as cg_mock:
                op.solve(b)
                op.inv_quad_logdet(b, logdet=True)
        self.assertFalse(cg_mock.called, "CG must not run on the Cholesky path")

    # -- sampling ---------------------------------------------------------

    def test_zero_mean_mvn_samples(self):
        if not self.should_test_sample:
            return
        op = self.create_linear_op()
        if op.batch_shape:
            return
        dense = self.evaluate_linear_op(op)
        samples = op.zero_mean_mvn_samples(20000, key=self.key)
        emp_cov = jnp.einsum("si,sj->ij", samples, samples) / samples.shape[0]
        # Monte-Carlo error scales with the covariance magnitude: compare on
        # a normalized scale (reference uses O(1) operators + rtol 0.3).
        scale = jnp.maximum(jnp.max(jnp.abs(dense)), 1e-12)
        self.assertAllClose(
            emp_cov / scale, dense / scale, **self.tolerances["sample"]
        )
