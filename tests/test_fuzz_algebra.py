"""Randomized operator-algebra fuzzing.

The per-operator harness (linear_operator_tpu/test/) checks each class in
isolation; this module builds random NESTED compositions (the way downstream
code composes the algebra, reference test strategy SURVEY.md section 4) and
asserts internal consistency against ``to_dense`` ground truth:

  matmul / rmatmul / diagonal / transpose / add_diagonal / getitem slices
  and, for PSD trees: solve, logdet, inv_quad, root_decomposition.

Seeded and deterministic; 40 general trees + 25 PSD trees per run.
"""

import unittest

import jax
import jax.numpy as jnp
import numpy as np

from linear_operator_tpu import settings
from linear_operator_tpu.operators import (
    BatchRepeatLinearOperator,
    BlockDiagLinearOperator,
    ConstantDiagLinearOperator,
    ConstantMulLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
    IdentityLinearOperator,
    KroneckerProductLinearOperator,
    LinearOperator,
    LowRankRootLinearOperator,
    MatmulLinearOperator,
    MulLinearOperator,
    PermutationLinearOperator,
    RootLinearOperator,
    SumLinearOperator,
    ToeplitzLinearOperator,
    TriangularLinearOperator,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase

DTYPE = jnp.float64


def _psd_dense(rng, n):
    a = jnp.asarray(rng.standard_normal((n, n)), DTYPE) / np.sqrt(n)
    return a @ a.T + 0.5 * jnp.eye(n, dtype=DTYPE)


def _rbf_noise_kernel_leaf(rng, n):
    """RBF kernel operator + noise diagonal (PSD; exercises the lazy-kernel
    engine inside arbitrary compositions, incl. its param pytree grads)."""
    from linear_operator_tpu.operators.kernel import KernelLinearOperator, rbf_covar

    x = jnp.asarray(rng.standard_normal((n, 2)), DTYPE)
    op = KernelLinearOperator(
        x,
        x,
        {
            "lengthscale": jnp.asarray(rng.uniform(0.7, 1.5), DTYPE),
            "outputscale": jnp.asarray(rng.uniform(0.5, 1.5), DTYPE),
        },
        covar_func=rbf_covar,
        symmetric=True,
    )
    return op.add_diagonal(jnp.asarray(rng.uniform(0.3, 1.0), DTYPE))


def _nystrom_linop_covar(x1, x2, lengthscale, inducing_points):
    """Covar closure returning a lazy MatmulLinearOperator (module-level so
    the operators pickle)."""
    from linear_operator_tpu.operators import MatmulLinearOperator
    from linear_operator_tpu.operators.kernel import rbf_covar

    one = jnp.ones((), x1.dtype)
    K_zz = rbf_covar(inducing_points, inducing_points, lengthscale, one)
    K_zz = K_zz + 1e-8 * jnp.eye(K_zz.shape[-1], dtype=K_zz.dtype)
    L = jnp.linalg.cholesky(K_zz)

    def tri(B):
        # broadcast the unbatched factor against batched covar blocks (the
        # diagonal path calls the closure with n batched into a leading dim)
        Lb = jnp.broadcast_to(L, (*B.shape[:-2], *L.shape[-2:]))
        return jax.scipy.linalg.solve_triangular(Lb, B, lower=True)

    A = tri(rbf_covar(inducing_points, x1, lengthscale, one))
    B = tri(rbf_covar(inducing_points, x2, lengthscale, one))
    return MatmulLinearOperator(jnp.swapaxes(A, -1, -2), B)


def _nystrom_kernel_leaf(rng, n):
    """Kernel operator whose covar closure returns a LinearOperator
    (round-4 capability), plus noise so the leaf is PD."""
    from linear_operator_tpu.operators.kernel import KernelLinearOperator

    x = jnp.asarray(rng.standard_normal((n, 2)), DTYPE)
    z = jnp.asarray(rng.standard_normal((max(n, 4), 2)), DTYPE)
    op = KernelLinearOperator(
        x,
        x,
        {
            "lengthscale": jnp.asarray(rng.uniform(0.8, 1.4), DTYPE),
            "inducing_points": z,
        },
        covar_func=_nystrom_linop_covar,
        nonbatch_dims=(("lengthscale", 0), ("inducing_points", 2)),
    )
    return op.add_diagonal(jnp.asarray(rng.uniform(0.4, 1.0), DTYPE))


def _psd_leaf(rng, key, n):
    """A random PSD leaf operator of size n."""
    choice = rng.integers(0, 8)
    if choice == 6:
        return _rbf_noise_kernel_leaf(rng, n)
    if choice == 7:
        return _nystrom_kernel_leaf(rng, n)
    if choice == 0:
        return DenseLinearOperator(_psd_dense(rng, n))
    if choice == 1:
        return DiagLinearOperator(
            jnp.asarray(rng.uniform(0.3, 2.0, (n,)), DTYPE)
        )
    if choice == 2:
        return ConstantDiagLinearOperator(
            jnp.asarray([rng.uniform(0.5, 2.0)], DTYPE), n
        )
    if choice == 3:
        return IdentityLinearOperator(n, dtype_="float64")
    if choice == 4:
        r = max(1, n // 2)
        u = jnp.asarray(rng.standard_normal((n, r)), DTYPE)
        return LowRankRootLinearOperator(DenseLinearOperator(u)).add_diagonal(
            jnp.asarray(rng.uniform(0.3, 1.0), DTYPE)
        )
    # Toeplitz: PSD via an RBF-on-grid first column
    dist = jnp.arange(n, dtype=DTYPE) * rng.uniform(0.2, 0.6)
    col = jnp.exp(-0.5 * dist**2) + (0.1 if n > 1 else 0.0) * jnp.eye(n, dtype=DTYPE)[0]
    return ToeplitzLinearOperator(col)


def _psd_tree(rng, key, n, depth):
    """Random PSD composition of total size n (closed under these rules)."""
    if depth <= 0:
        return _psd_leaf(rng, key, n)
    choice = rng.integers(0, 6)
    if choice == 0:  # sum of two PSD
        return _psd_tree(rng, key, n, depth - 1) + _psd_tree(rng, key, n, depth - 1)
    if choice == 1:  # positive scalar multiple
        c = jnp.asarray(rng.uniform(0.5, 2.0), DTYPE)
        return ConstantMulLinearOperator(_psd_tree(rng, key, n, depth - 1), c)
    if choice == 2:  # add_diagonal
        return _psd_tree(rng, key, n, depth - 1).add_diagonal(
            jnp.asarray(rng.uniform(0.2, 1.0, (n,)), DTYPE)
        )
    if choice == 3 and n % 2 == 0 and n >= 4:  # Kronecker of PSD factors
        return KroneckerProductLinearOperator(
            (_psd_tree(rng, key, 2, depth - 1), _psd_tree(rng, key, n // 2, depth - 1))
        )
    if choice == 4 and n % 2 == 0:  # block-diag of a batched PSD base
        base = DenseLinearOperator(
            jnp.stack([_psd_dense(rng, n // 2) for _ in range(2)])
        )
        return BlockDiagLinearOperator(base)
    if choice == 5:  # Hadamard product of PSD (Schur product theorem)
        return MulLinearOperator(
            _psd_leaf(rng, key, n), _psd_leaf(rng, key, n)
        )
    return _psd_leaf(rng, key, n)


def _general_leaf(rng, key, n):
    choice = rng.integers(0, 4)
    if choice == 0:
        return DenseLinearOperator(jnp.asarray(rng.standard_normal((n, n)), DTYPE))
    if choice == 1:
        return TriangularLinearOperator(
            DenseLinearOperator(
                jnp.tril(jnp.asarray(rng.standard_normal((n, n)), DTYPE))
                + jnp.eye(n, dtype=DTYPE)
            )
        )
    if choice == 2:
        perm = jnp.asarray(rng.permutation(n), jnp.int64)
        return PermutationLinearOperator(perm, dtype_="float64")
    return _psd_leaf(rng, key, n)


def _general_tree(rng, key, n, depth):
    if depth <= 0:
        return _general_leaf(rng, key, n)
    choice = rng.integers(0, 5)
    if choice == 0:
        return SumLinearOperator(
            (_general_tree(rng, key, n, depth - 1), _general_tree(rng, key, n, depth - 1))
        )
    if choice == 1:
        return MatmulLinearOperator(
            _general_tree(rng, key, n, depth - 1), _general_tree(rng, key, n, depth - 1)
        )
    if choice == 2:
        c = jnp.asarray(rng.standard_normal(), DTYPE)
        return ConstantMulLinearOperator(_general_tree(rng, key, n, depth - 1), c)
    if choice == 3:
        return _general_tree(rng, key, n, depth - 1).transpose(-1, -2)
    if choice == 4 and n % 2 == 0 and n >= 4:
        return KroneckerProductLinearOperator(
            (_general_tree(rng, key, 2, depth - 1), _general_tree(rng, key, n // 2, depth - 1))
        )
    return _general_leaf(rng, key, n)


class TestFuzzGeneral(BaseTestCase):
    """Forward-surface consistency of random general compositions."""

    def test_random_trees_consistent_with_dense(self):
        rng = np.random.default_rng(2026)
        for trial in range(40):
            n = int(rng.choice([4, 6, 8]))
            depth = int(rng.integers(1, 4))
            op = _general_tree(rng, self.key, n, depth)
            assert isinstance(op, LinearOperator), type(op)
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} n={n} depth={depth}"
            self.assertEqual(dense.shape, op.shape, msg)

            rhs = jnp.asarray(rng.standard_normal((op.shape[-1], 3)), DTYPE)
            self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-9, atol=1e-9, msg=msg)

            lhs = jnp.asarray(rng.standard_normal((2, op.shape[-2])), DTYPE)
            self.assertAllClose(lhs @ op, lhs @ dense, rtol=1e-9, atol=1e-9, msg=msg)

            self.assertAllClose(
                op.diagonal(), jnp.diagonal(dense), rtol=1e-9, atol=1e-9, msg=msg
            )
            self.assertAllClose(
                op.transpose(-1, -2).to_dense(), dense.T, rtol=1e-9, atol=1e-9, msg=msg
            )
            d = jnp.asarray(rng.uniform(0.1, 1.0, (op.shape[-1],)), DTYPE)
            if op.shape[-1] == op.shape[-2]:
                self.assertAllClose(
                    op.add_diagonal(d).to_dense(),
                    dense + jnp.diag(d),
                    rtol=1e-9,
                    atol=1e-9,
                    msg=msg,
                )
            # slicing stays consistent
            k = op.shape[-2] // 2
            sub = op[:k, 1:]
            sub = sub.to_dense() if isinstance(sub, LinearOperator) else sub
            self.assertAllClose(sub, dense[:k, 1:], rtol=1e-9, atol=1e-9, msg=msg)


class TestFuzzPSD(BaseTestCase):
    """Solve/logdet/root consistency of random PSD compositions."""

    def test_random_psd_trees_solve_and_logdet(self):
        rng = np.random.default_rng(77)
        for trial in range(25):
            n = int(rng.choice([4, 6, 8]))
            depth = int(rng.integers(1, 4))
            op = _psd_tree(rng, self.key, n, depth)
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} n={op.shape[-1]} depth={depth}"
            self.assertAllClose(dense, jnp.swapaxes(dense, -1, -2), atol=1e-10, msg=msg)
            w = jnp.linalg.eigvalsh(dense)
            self.assertGreater(float(jnp.min(w)), 0.0, msg)

            rhs = jnp.asarray(rng.standard_normal((op.shape[-1], 2)), DTYPE)
            with settings.max_cholesky_size(1000):
                x = op.solve(rhs)
                iq, ld = op.inv_quad_logdet(rhs, logdet=True)
            self.assertAllClose(
                x, jnp.linalg.solve(dense, rhs), rtol=1e-7, atol=1e-8, msg=msg
            )
            self.assertAllClose(
                ld, jnp.linalg.slogdet(dense)[1], rtol=1e-8, atol=1e-8, msg=msg
            )
            self.assertAllClose(
                iq,
                jnp.sum(rhs * jnp.linalg.solve(dense, rhs)),
                rtol=1e-7,
                atol=1e-8,
                msg=msg,
            )
            root = op.root_decomposition().root.to_dense()
            self.assertAllClose(
                root @ jnp.swapaxes(root, -1, -2), dense, rtol=1e-6, atol=1e-7, msg=msg
            )

    def test_random_psd_trees_iterative_solve(self):
        """The same trees through the CG path (max_cholesky_size 0)."""
        rng = np.random.default_rng(13)
        for trial in range(10):
            n = int(rng.choice([6, 8]))
            op = _psd_tree(rng, self.key, n, int(rng.integers(1, 3)))
            dense = op.to_dense()
            rhs = jnp.asarray(rng.standard_normal((op.shape[-1], 2)), DTYPE)
            with settings.max_cholesky_size(0), settings.cg_tolerance(1e-12), \
                 settings.max_cg_iterations(400), settings.min_preconditioning_size(10**9):
                x = op.solve(rhs)
            self.assertAllClose(
                x,
                jnp.linalg.solve(dense, rhs),
                rtol=1e-6,
                atol=1e-7,
                msg=f"trial {trial}: {type(op).__name__}",
            )




class TestDtypeRegression(BaseTestCase):
    """Found by the fuzzer: composites whose only array leaves are integer
    indices must still report a float dtype (add_diagonal casts the added
    diagonal to self.dtype — an int dtype silently truncated it to zeros)."""

    def test_sum_of_permutations_add_diagonal(self):
        p0 = PermutationLinearOperator(jnp.asarray([1, 2, 0, 3], jnp.int64))
        p1 = PermutationLinearOperator(jnp.asarray([3, 0, 1, 2], jnp.int64))
        s = p0 + p1
        assert jnp.issubdtype(s.dtype, jnp.floating), s.dtype
        d = jnp.asarray([0.25, 0.5, 0.75, 1.25], DTYPE)
        ad = s.add_diagonal(d)
        self.assertAllClose(
            ad.to_dense(), s.to_dense() + jnp.diag(d), rtol=1e-12, atol=1e-12
        )

    def test_permutation_astype_roundtrip(self):
        p = PermutationLinearOperator(jnp.asarray([2, 0, 1], jnp.int64))
        assert p.dtype == jnp.float32  # reference-parity default (f32)
        p64 = p.astype(jnp.float64)
        assert p64.dtype == jnp.float64
        assert p64.to_dense().dtype == jnp.float64
        assert p64.transpose(-1, -2).dtype == jnp.float64
        assert p64.diagonal().dtype == jnp.float64
        # composing a default Permutation with f32 operators must NOT upcast
        s32 = p + DenseLinearOperator(jnp.eye(3, dtype=jnp.float32))
        assert s32.dtype == jnp.float32, s32.dtype


def _psd_leaf_batched(rng, key, n, batch):
    choice = rng.integers(0, 4)
    if choice == 0:
        return DenseLinearOperator(
            jnp.stack(
                [jnp.stack([_psd_dense(rng, n) for _ in range(batch[-1])])
                 for _ in range(batch[0])]
            )
            if len(batch) == 2
            else jnp.stack([_psd_dense(rng, n) for _ in range(batch[0])])
        )
    if choice == 1:
        return DiagLinearOperator(jnp.asarray(rng.uniform(0.3, 2.0, (*batch, n)), DTYPE))
    if choice == 2:
        return ConstantDiagLinearOperator(
            jnp.asarray(rng.uniform(0.5, 2.0, (*batch, 1)), DTYPE), n
        )
    # broadcasting leaf: unbatched PSD against the batched rest
    return _psd_leaf(rng, key, n)


def _psd_tree_batched(rng, key, n, batch, depth):
    if depth <= 0:
        return _psd_leaf_batched(rng, key, n, batch)
    choice = rng.integers(0, 4)
    if choice == 0:
        return _psd_tree_batched(rng, key, n, batch, depth - 1) + _psd_tree_batched(
            rng, key, n, batch, depth - 1
        )
    if choice == 1:
        c = jnp.asarray(rng.uniform(0.5, 2.0), DTYPE)
        return ConstantMulLinearOperator(
            _psd_tree_batched(rng, key, n, batch, depth - 1), c
        )
    if choice == 2:
        return _psd_tree_batched(rng, key, n, batch, depth - 1).add_diagonal(
            jnp.asarray(rng.uniform(0.2, 1.0, (*batch, n)), DTYPE)
        )
    if choice == 3:
        base = _psd_leaf_batched(rng, key, n, batch)
        return BatchRepeatLinearOperator(
            _psd_leaf(rng, key, n), batch_repeat=batch
        ) + base
    return _psd_leaf_batched(rng, key, n, batch)


class TestFuzzBatched(BaseTestCase):
    """Batched/broadcast PSD compositions: solve + iqld over batch dims."""

    def test_batched_psd_trees(self):
        rng = np.random.default_rng(5)
        for trial in range(15):
            n = int(rng.choice([4, 6]))
            batch = (2,) if trial % 2 == 0 else (2, 3)
            op = _psd_tree_batched(rng, self.key, n, batch, int(rng.integers(1, 3)))
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} batch={op.batch_shape}"
            self.assertEqual(dense.shape[-1], n, msg)
            # batch shape must broadcast to `batch` (leaves may be unbatched)
            bshape = op.batch_shape
            np.broadcast_shapes(bshape, batch)

            rhs = jnp.asarray(rng.standard_normal((*bshape, n, 2)), DTYPE)
            self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-9, atol=1e-9, msg=msg)
            self.assertAllClose(
                op.diagonal(),
                jnp.diagonal(dense, axis1=-2, axis2=-1),
                rtol=1e-9,
                atol=1e-9,
                msg=msg,
            )
            with settings.max_cholesky_size(1000):
                x = op.solve(rhs)
                iq, ld = op.inv_quad_logdet(rhs, logdet=True)
            self.assertAllClose(
                x, jnp.linalg.solve(dense, rhs), rtol=1e-7, atol=1e-8, msg=msg
            )
            self.assertAllClose(
                ld, jnp.linalg.slogdet(dense)[1], rtol=1e-8, atol=1e-8, msg=msg
            )
            self.assertAllClose(
                iq,
                jnp.sum(rhs * jnp.linalg.solve(dense, rhs), axis=(-2, -1)),
                rtol=1e-7,
                atol=1e-8,
                msg=msg,
            )


def _sub_batch(rng, batch):
    """A random broadcast-compatible variant of ``batch``: each dim kept or
    set to 1, leading dims optionally dropped."""
    keep_from = int(rng.integers(0, len(batch) + 1))
    out = tuple(
        b if rng.random() < 0.6 else 1 for b in batch[keep_from:]
    )
    return out


class TestFuzzMixedBatchBroadcast(BaseTestCase):
    """Heterogeneous leaf batch shapes inside one tree (each leaf a random
    broadcast-compatible sub-shape of the target batch) plus an EXTRA
    leading rhs batch dim — the reference broadcasts everywhere
    (torch.linalg semantics); round-3 fixed two operators that did not."""

    def test_mixed_leaf_batches_and_extra_rhs_dim(self):
        rng = np.random.default_rng(17)
        for trial in range(15):
            n = int(rng.choice([4, 6]))
            batch = (2, 3) if trial % 2 == 0 else (3,)

            def leaf(rng=rng, n=n, batch=batch):
                return _psd_leaf_batched(rng, self.key, n, _sub_batch(rng, batch) or (1,))

            # sum of 2-3 leaves with mismatched-but-broadcastable batches,
            # optionally wrapped in add_diagonal with its own sub-batch
            op = leaf()
            for _ in range(int(rng.integers(1, 3))):
                op = op + leaf()
            if rng.random() < 0.5:
                db = _sub_batch(rng, batch)
                op = op.add_diagonal(
                    jnp.asarray(rng.uniform(0.2, 1.0, (*db, n)), DTYPE)
                )
            dense = op.to_dense()
            bshape = op.batch_shape
            np.broadcast_shapes(bshape, batch)
            msg = f"trial {trial}: {type(op).__name__} batch={bshape}"

            # extra leading rhs dim on top of the operator's own batch
            rhs = jnp.asarray(rng.standard_normal((2, *bshape, n, 2)), DTYPE)
            self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-9, atol=1e-9, msg=msg)
            with settings.max_cholesky_size(1000):
                x = op.solve(rhs)
                iq, ld = op.inv_quad_logdet(rhs, logdet=True)
            self.assertAllClose(
                x, jnp.linalg.solve(dense, rhs), rtol=1e-7, atol=1e-8, msg=msg
            )
            self.assertAllClose(
                ld, jnp.linalg.slogdet(dense)[1], rtol=1e-8, atol=1e-8, msg=msg
            )
            self.assertAllClose(
                iq,
                jnp.sum(rhs * jnp.linalg.solve(dense, rhs), axis=(-2, -1)),
                rtol=1e-7,
                atol=1e-8,
                msg=msg,
            )
            # iterative path with the same broadcast rhs
            with settings.max_cholesky_size(0), settings.cg_tolerance(1e-12), \
                 settings.max_cg_iterations(400):
                x_cg = op.solve(rhs)
            self.assertAllClose(
                x_cg, jnp.linalg.solve(dense, rhs), rtol=1e-6, atol=1e-7, msg=msg
            )


class TestFuzzGradients(BaseTestCase):
    """Gradients of solve/inv_quad_logdet through random PSD trees: the
    custom VJPs (functions/_solve.py, _inv_quad_logdet.py) must match
    differentiating the dense computation w.r.t. every float leaf of the
    operator pytree — the composite analog of the harness's per-operator
    backward tests."""

    def _grad_pair(self, op, rhs, w, iterative):
        from linear_operator_tpu.functions import inv_quad_logdet, solve

        def loss_op(op):
            if iterative:
                ctx = (
                    settings.max_cholesky_size(0),
                    settings.cg_tolerance(1e-12),
                    settings.max_cg_iterations(400),
                    settings.min_preconditioning_size(10**9),
                    settings.num_trace_samples(1024),
                )
            else:
                ctx = (settings.max_cholesky_size(1000),)
            import contextlib

            with contextlib.ExitStack() as stack:
                for c in ctx:
                    stack.enter_context(c)
                x = solve(op, rhs)
                iq, ld = inv_quad_logdet(
                    op, rhs, logdet=True, key=jax.random.PRNGKey(0)
                )
            return jnp.sum(x * w) + jnp.sum(iq) + 0.5 * jnp.sum(ld)

        def loss_dense(op):
            dense = op.to_dense()
            sol = jnp.linalg.solve(dense, rhs)
            iq = jnp.sum(rhs * sol)
            ld = jnp.linalg.slogdet(dense)[1]
            return jnp.sum(sol * w) + iq + 0.5 * jnp.sum(ld)

        g_op = jax.grad(loss_op, allow_int=True)(op)
        g_dense = jax.grad(loss_dense, allow_int=True)(op)
        return g_op, g_dense

    def _compare(self, g_op, g_dense, msg, rtol, atol):
        for a, b in zip(
            jax.tree_util.tree_leaves(g_op), jax.tree_util.tree_leaves(g_dense)
        ):
            if not hasattr(a, "dtype") or not jnp.issubdtype(a.dtype, jnp.floating):
                continue  # float0 tangents of integer leaves
            self.assertAllClose(a, b, rtol=rtol, atol=atol, msg=msg)

    def test_grads_cholesky_path(self):
        rng = np.random.default_rng(99)
        for trial in range(12):
            n = int(rng.choice([4, 6]))
            op = _psd_tree(rng, self.key, n, int(rng.integers(1, 3)))
            rhs = jnp.asarray(rng.standard_normal((op.shape[-1], 2)), DTYPE)
            w = jnp.asarray(rng.standard_normal(rhs.shape), DTYPE)
            msg = f"trial {trial}: {type(op).__name__}"
            g_op, g_dense = self._grad_pair(op, rhs, w, iterative=False)
            self._compare(g_op, g_dense, msg, rtol=1e-6, atol=1e-8)

    def test_grads_cg_slq_path(self):
        """Stochastic-estimator gradients are unbiased: 1024 probes at tiny n
        puts them within a loose envelope of the exact dense gradients."""
        rng = np.random.default_rng(41)
        for trial in range(5):
            n = int(rng.choice([4, 6]))
            op = _psd_tree(rng, self.key, n, int(rng.integers(1, 3)))
            rhs = jnp.asarray(rng.standard_normal((op.shape[-1], 2)), DTYPE)
            w = jnp.asarray(rng.standard_normal(rhs.shape), DTYPE)
            msg = f"trial {trial}: {type(op).__name__}"
            g_op, g_dense = self._grad_pair(op, rhs, w, iterative=True)
            scale = max(
                float(jnp.max(jnp.abs(leaf)))
                for leaf in jax.tree_util.tree_leaves(g_dense)
                if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
            ) + 1e-12
            g_op = jax.tree_util.tree_map(
                lambda a: a / scale if jnp.issubdtype(a.dtype, jnp.floating) else a, g_op
            )
            g_dense = jax.tree_util.tree_map(
                lambda a: a / scale if jnp.issubdtype(a.dtype, jnp.floating) else a,
                g_dense,
            )
            self._compare(g_op, g_dense, msg, rtol=0.0, atol=0.15)


class TestFuzzStructural(BaseTestCase):
    """Cat / Masked / Block / Root / Mul wrappers around random trees."""

    def test_structural_wrappers_consistent(self):
        from linear_operator_tpu.operators import (
            BlockInterleavedLinearOperator,
            CatLinearOperator,
            MaskedLinearOperator,
        )

        rng = np.random.default_rng(8)
        for trial in range(25):
            n = int(rng.choice([4, 6]))
            inner = lambda: _general_tree(rng, self.key, n, int(rng.integers(0, 3)))
            kind = trial % 5
            if kind == 0:  # row-cat of two trees
                op = CatLinearOperator((inner(), inner()), cat_dim=-2)
            elif kind == 1:  # col-cat
                op = CatLinearOperator((inner(), inner()), cat_dim=-1)
            elif kind == 2:  # masked view
                base = inner()
                rows = jnp.asarray(
                    np.sort(rng.choice(n, size=n - 1, replace=False)), jnp.int32
                )
                cols = jnp.asarray(
                    np.sort(rng.choice(n, size=n - 2, replace=False)), jnp.int32
                )
                op = MaskedLinearOperator(base, rows, cols)
            elif kind == 3:  # interleaved blocks of a batched tree
                base = DenseLinearOperator(
                    jnp.stack([_psd_dense(rng, n) for _ in range(3)])
                )
                op = BlockInterleavedLinearOperator(base)
            else:  # Hadamard of two PSD trees through root machinery
                op = MulLinearOperator(
                    _psd_leaf(rng, self.key, n), _psd_leaf(rng, self.key, n)
                )
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} kind={kind}"
            self.assertEqual(dense.shape, op.shape, msg)
            rhs = jnp.asarray(rng.standard_normal((op.shape[-1], 3)), DTYPE)
            self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-8, atol=1e-9, msg=msg)
            lhs = jnp.asarray(rng.standard_normal((2, op.shape[-2])), DTYPE)
            self.assertAllClose(lhs @ op, lhs @ dense, rtol=1e-8, atol=1e-9, msg=msg)
            if op.shape[-1] == op.shape[-2]:
                self.assertAllClose(
                    op.diagonal(),
                    jnp.diagonal(dense),
                    rtol=1e-8,
                    atol=1e-9,
                    msg=msg,
                )
            self.assertAllClose(
                op.transpose(-1, -2).to_dense(), jnp.swapaxes(dense, -1, -2),
                rtol=1e-8, atol=1e-9, msg=msg,
            )
            k = max(1, op.shape[-2] // 2)
            sub = op[:k, 1:]
            sub = sub.to_dense() if isinstance(sub, LinearOperator) else sub
            self.assertAllClose(sub, dense[:k, 1:], rtol=1e-8, atol=1e-9, msg=msg)


class TestFuzzSpectral(BaseTestCase):
    """eigh / svd / root_inv_decomposition over random PSD trees."""

    def test_spectral_methods_reconstruct(self):
        rng = np.random.default_rng(21)
        for trial in range(12):
            n = int(rng.choice([4, 6]))
            op = _psd_tree(rng, self.key, n, int(rng.integers(1, 3)))
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__}"

            evals, evecs = op.eigh()
            v = evecs.to_dense() if isinstance(evecs, LinearOperator) else evecs
            recon = (v * evals[..., None, :]) @ jnp.swapaxes(v, -1, -2)
            self.assertAllClose(recon, dense, rtol=1e-8, atol=1e-9, msg=msg)
            self.assertAllClose(
                jnp.sort(evals, axis=-1),
                jnp.linalg.eigvalsh(dense),
                rtol=1e-8,
                atol=1e-9,
                msg=msg,
            )

            u, s, v = op.svd()  # A = U S V^T (torch convention)
            ud = u.to_dense() if isinstance(u, LinearOperator) else u
            vd = v.to_dense() if isinstance(v, LinearOperator) else v
            self.assertAllClose(
                (ud * s[..., None, :]) @ jnp.swapaxes(vd, -1, -2),
                dense,
                rtol=1e-8,
                atol=1e-9,
                msg=msg,
            )

            with settings.max_cholesky_size(1000):
                rinv = op.root_inv_decomposition().root.to_dense()
            self.assertAllClose(
                rinv @ jnp.swapaxes(rinv, -1, -2),
                jnp.linalg.inv(dense),
                rtol=1e-5,
                atol=1e-6,
                msg=msg,
            )


def _rect_leaf(rng, key, n, m):
    """A random rectangular (n, m) leaf."""
    choice = rng.integers(0, 3)
    if choice == 0:
        return DenseLinearOperator(jnp.asarray(rng.standard_normal((n, m)), DTYPE))
    if choice == 1:  # masked view of a bigger square tree
        from linear_operator_tpu.operators import MaskedLinearOperator

        big = max(n, m) + 2
        base = _general_leaf(rng, key, big)
        rows = jnp.asarray(np.sort(rng.choice(big, size=n, replace=False)), jnp.int32)
        cols = jnp.asarray(np.sort(rng.choice(big, size=m, replace=False)), jnp.int32)
        return MaskedLinearOperator(base, rows, cols)
    k = int(rng.integers(2, 5))
    return MatmulLinearOperator(
        DenseLinearOperator(jnp.asarray(rng.standard_normal((n, k)), DTYPE)),
        DenseLinearOperator(jnp.asarray(rng.standard_normal((k, m)), DTYPE)),
    )


def _rect_tree(rng, key, n, m, depth):
    """Random rectangular (n, m) composition."""
    from linear_operator_tpu.operators import CatLinearOperator

    if depth <= 0:
        return _rect_leaf(rng, key, n, m)
    choice = rng.integers(0, 6)
    if choice == 0:  # sum
        return SumLinearOperator(
            (_rect_tree(rng, key, n, m, depth - 1), _rect_tree(rng, key, n, m, depth - 1))
        )
    if choice == 1:  # matmul through a random inner size
        k = int(rng.integers(2, 6))
        return MatmulLinearOperator(
            _rect_tree(rng, key, n, k, depth - 1), _rect_tree(rng, key, k, m, depth - 1)
        )
    if choice == 2:  # transpose of the flipped shape
        return _rect_tree(rng, key, m, n, depth - 1).transpose(-1, -2)
    if choice == 3 and n >= 2:  # row-cat
        n1 = int(rng.integers(1, n))
        return CatLinearOperator(
            (_rect_tree(rng, key, n1, m, depth - 1), _rect_tree(rng, key, n - n1, m, depth - 1)),
            cat_dim=-2,
        )
    if choice == 4 and m >= 2:  # col-cat
        m1 = int(rng.integers(1, m))
        return CatLinearOperator(
            (_rect_tree(rng, key, n, m1, depth - 1), _rect_tree(rng, key, n, m - m1, depth - 1)),
            cat_dim=-1,
        )
    if choice == 5:  # scalar multiple
        c = jnp.asarray(rng.standard_normal(), DTYPE)
        return ConstantMulLinearOperator(_rect_tree(rng, key, n, m, depth - 1), c)
    return _rect_leaf(rng, key, n, m)


class TestFuzzRectangular(BaseTestCase):
    """Rectangular compositions (Matmul/Cat/Masked/transpose): the reference's
    RectangularLinearOperatorTestCase surface over random trees."""

    def test_rectangular_trees_consistent(self):
        rng = np.random.default_rng(314)
        for trial in range(30):
            n = int(rng.integers(3, 8))
            m = int(rng.integers(3, 8))
            depth = int(rng.integers(1, 4))
            op = _rect_tree(rng, self.key, n, m, depth)
            assert isinstance(op, LinearOperator), type(op)
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} shape=({n},{m}) depth={depth}"
            self.assertEqual(op.shape, (n, m), msg)
            self.assertEqual(dense.shape, (n, m), msg)

            rhs = jnp.asarray(rng.standard_normal((m, 3)), DTYPE)
            self.assertAllClose(op @ rhs, dense @ rhs, rtol=1e-8, atol=1e-9, msg=msg)
            lhs = jnp.asarray(rng.standard_normal((2, n)), DTYPE)
            self.assertAllClose(lhs @ op, lhs @ dense, rtol=1e-8, atol=1e-9, msg=msg)
            self.assertAllClose(
                op.transpose(-1, -2).to_dense(), dense.T, rtol=1e-8, atol=1e-9, msg=msg
            )
            # matmul against another lazy operator stays consistent
            other = _rect_leaf(rng, self.key, m, int(rng.integers(2, 5)))
            prod = op @ other
            pd = prod.to_dense() if isinstance(prod, LinearOperator) else prod
            self.assertAllClose(
                pd, dense @ other.to_dense(), rtol=1e-8, atol=1e-9, msg=msg
            )
            # slicing
            sub = op[1:, : max(1, m // 2)]
            sub = sub.to_dense() if isinstance(sub, LinearOperator) else sub
            self.assertAllClose(
                sub, dense[1:, : max(1, m // 2)], rtol=1e-8, atol=1e-9, msg=msg
            )
            # A A^T is PSD: solve through it closes the loop back to square
            sq = op @ op.transpose(-1, -2)
            sqd = sq.to_dense() if isinstance(sq, LinearOperator) else sq
            self.assertAllClose(
                sqd, dense @ dense.T, rtol=1e-8, atol=1e-9, msg=msg
            )


class TestFuzzMvnSamples(BaseTestCase):
    """zero_mean_mvn_samples moment checks over random PSD trees: with an
    EXACT root (Cholesky path) the sample covariance converges at the
    Monte-Carlo rate, so S samples put ||cov_hat - K||_max inside a
    ~5/sqrt(S) envelope of the operator scale."""

    def test_sample_covariance_matches_operator(self):
        rng = np.random.default_rng(1234)
        S = 60_000
        for trial in range(8):
            n = int(rng.choice([3, 4, 5]))
            op = _psd_tree(rng, self.key, n, int(rng.integers(1, 3)))
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} n={n}"
            with settings.max_cholesky_size(1000):
                samples = op.zero_mean_mvn_samples(S, key=jax.random.PRNGKey(trial))
            self.assertEqual(samples.shape, (S, n), msg)
            scale = float(jnp.max(jnp.diagonal(dense)))
            mean = jnp.mean(samples, axis=0)
            self.assertAllClose(
                mean, jnp.zeros(n, DTYPE), rtol=0.0,
                atol=6.0 * np.sqrt(scale / S), msg=msg,
            )
            cov = (samples.T @ samples) / S
            self.assertAllClose(
                cov, dense, rtol=0.0, atol=7.0 * scale / np.sqrt(S), msg=msg
            )

    def test_sample_covariance_ciq_path(self):
        """The CIQ sampling path (settings.ciq_samples) hits sqrt_matmul:
        same moment envelope on a generic PSD tree."""
        rng = np.random.default_rng(4321)
        S = 40_000
        n = 4
        op = _psd_tree(rng, self.key, n, 2)
        dense = op.to_dense()
        with settings.ciq_samples(True), settings.max_cholesky_size(1000):
            samples = op.zero_mean_mvn_samples(S, key=jax.random.PRNGKey(7))
        self.assertEqual(samples.shape, (S, n))
        scale = float(jnp.max(jnp.diagonal(dense)))
        cov = (samples.T @ samples) / S
        self.assertAllClose(cov, dense, rtol=0.0, atol=8.0 * scale / np.sqrt(S))

    def test_batched_sample_shape_and_moments(self):
        rng = np.random.default_rng(99)
        S = 40_000
        n, b = 3, 2
        op = _psd_tree_batched(rng, self.key, n, (b,), 1)
        dense = op.to_dense()
        with settings.max_cholesky_size(1000):
            samples = op.zero_mean_mvn_samples(S, key=jax.random.PRNGKey(3))
        self.assertEqual(samples.shape, (S, *op.batch_shape, n))
        dense = jnp.broadcast_to(dense, (*samples.shape[1:-1], n, n))
        cov = jnp.einsum("s...i,s...j->...ij", samples, samples) / S
        scale = float(jnp.max(jnp.abs(dense)))
        self.assertAllClose(cov, dense, rtol=0.0, atol=7.0 * scale / np.sqrt(S))


class TestFuzzReduceInvQuad(BaseTestCase):
    """reduce_inv_quad=False returns the per-column quadratic forms
    rhs_j^T K^{-1} rhs_j (reference inv_quad_logdet contract) — fuzzed over
    PSD trees on both the Cholesky and the CG path, square and batched."""

    def test_per_column_inv_quad_cholesky_path(self):
        from linear_operator_tpu.functions import inv_quad_logdet

        rng = np.random.default_rng(55)
        for trial in range(10):
            n = int(rng.choice([4, 6]))
            op = _psd_tree(rng, self.key, n, int(rng.integers(1, 3)))
            dense = op.to_dense()
            t = int(rng.integers(1, 4))
            rhs = jnp.asarray(rng.standard_normal((n, t)), DTYPE)
            msg = f"trial {trial}: {type(op).__name__} t={t}"
            with settings.max_cholesky_size(1000):
                iq, ld = inv_quad_logdet(
                    op, rhs, logdet=True, reduce_inv_quad=False
                )
            expected = jnp.sum(rhs * jnp.linalg.solve(dense, rhs), axis=-2)
            self.assertEqual(iq.shape, (t,), msg)
            self.assertAllClose(iq, expected, rtol=1e-7, atol=1e-8, msg=msg)
            self.assertAllClose(
                ld, jnp.linalg.slogdet(dense)[1], rtol=1e-8, atol=1e-8, msg=msg
            )
            # reduced form is the sum of the per-column form
            with settings.max_cholesky_size(1000):
                iq_red, _ = inv_quad_logdet(op, rhs, reduce_inv_quad=True)
            self.assertAllClose(iq_red, jnp.sum(iq), rtol=1e-9, atol=1e-10, msg=msg)

    def test_per_column_inv_quad_cg_path(self):
        from linear_operator_tpu.functions import inv_quad_logdet

        rng = np.random.default_rng(66)
        for trial in range(6):
            n = int(rng.choice([6, 8]))
            op = _psd_tree(rng, self.key, n, int(rng.integers(1, 3)))
            dense = op.to_dense()
            rhs = jnp.asarray(rng.standard_normal((n, 2)), DTYPE)
            msg = f"trial {trial}: {type(op).__name__}"
            with settings.max_cholesky_size(0), settings.cg_tolerance(1e-12), \
                 settings.max_cg_iterations(400), settings.min_preconditioning_size(10**9):
                iq, _ = inv_quad_logdet(op, rhs, reduce_inv_quad=False)
            expected = jnp.sum(rhs * jnp.linalg.solve(dense, rhs), axis=-2)
            self.assertEqual(iq.shape, (2,), msg)
            self.assertAllClose(iq, expected, rtol=1e-6, atol=1e-7, msg=msg)

    def test_per_column_inv_quad_batched(self):
        from linear_operator_tpu.functions import inv_quad_logdet

        rng = np.random.default_rng(77)
        for trial in range(6):
            n = int(rng.choice([4, 6]))
            op = _psd_tree_batched(rng, self.key, n, (2,), int(rng.integers(1, 3)))
            dense = op.to_dense()
            bshape = op.batch_shape
            rhs = jnp.asarray(rng.standard_normal((*bshape, n, 3)), DTYPE)
            msg = f"trial {trial}: {type(op).__name__} batch={bshape}"
            with settings.max_cholesky_size(1000):
                iq, _ = inv_quad_logdet(op, rhs, reduce_inv_quad=False)
            expected = jnp.sum(rhs * jnp.linalg.solve(dense, rhs), axis=-2)
            self.assertEqual(iq.shape, (*bshape, 3), msg)
            self.assertAllClose(iq, expected, rtol=1e-7, atol=1e-8, msg=msg)


if __name__ == "__main__":
    unittest.main()
