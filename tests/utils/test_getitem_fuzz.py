"""Randomized ``__getitem__`` fuzzing.

The index calculus (utils/getitem.py, reference utils/getitem.py:19-207 +
_linear_operator.py:2829-2926) is the most combinatorial surface in the
package; the harness only checks fixed patterns.  Here random index tuples
drawn from the SUPPORTED grammar (ints / slices / 1-D index arrays on any
dim, newaxis in batch positions, ellipsis) are applied to lazy operators and
compared elementwise against torch indexing of the dense ground truth —
torch tensor semantics are the exact contract the reference inherits.
(numpy differs in one corner: a bare int combined with an index array
separated by a slice triggers numpy's advanced-placement front migration;
torch keeps ints purely basic — verified against the reference.)
"""

import unittest

import jax.numpy as jnp
import numpy as np
import torch

from linear_operator_tpu.operators import (
    DenseLinearOperator,
    DiagLinearOperator,
    LinearOperator,
    SumLinearOperator,
    ToeplitzLinearOperator,
)
from linear_operator_tpu.test.base_test_case import BaseTestCase

DTYPE = jnp.float64


def _rand_slice(rng, size):
    start = int(rng.integers(0, size))
    stop = int(rng.integers(start, size + 1))
    step = int(rng.choice([1, 1, 2]))
    kind = rng.integers(0, 4)
    if kind == 0:
        return slice(None)
    if kind == 1:
        return slice(start, None, step)
    if kind == 2:
        return slice(None, stop, step)
    return slice(start, stop, step)


def _rand_int(rng, size):
    v = int(rng.integers(-size, size))
    return v


def _rand_array(rng, size):
    k = int(rng.integers(1, size + 1))
    return jnp.asarray(rng.integers(-size, size, (k,)), jnp.int32)


def _rand_bool_mask(rng, size):
    # ensure at least one True so shapes stay non-degenerate most trials
    m = rng.integers(0, 2, (size,)).astype(bool)
    if not m.any():
        m[int(rng.integers(0, size))] = True
    return jnp.asarray(m)


def _rand_index(rng, size, kinds=("slice", "int", "array")):
    kind = rng.choice(kinds)
    if kind == "slice":
        return _rand_slice(rng, size)
    if kind == "int":
        return _rand_int(rng, size)
    if kind == "bool":
        return _rand_bool_mask(rng, size)
    return _rand_array(rng, size)


def _to_torch_index(t):
    out = []
    for ix in t:
        if isinstance(ix, jnp.ndarray):
            out.append(torch.from_numpy(np.asarray(ix).copy()))
        else:
            out.append(ix)
    return tuple(out)


def _make_op(rng, n, batch=()):
    choice = rng.integers(0, 3)
    if choice == 0:
        return DenseLinearOperator(
            jnp.asarray(rng.standard_normal((*batch, n, n)), DTYPE)
        )
    if choice == 1:
        return DiagLinearOperator(
            jnp.asarray(rng.uniform(0.5, 2.0, (*batch, n)), DTYPE)
        )
    # a lazy composite: sum of dense + diag
    return SumLinearOperator(
        (
            DenseLinearOperator(
                jnp.asarray(rng.standard_normal((*batch, n, n)), DTYPE)
            ),
            DiagLinearOperator(jnp.asarray(rng.uniform(0.5, 2.0, (*batch, n)), DTYPE)),
        )
    )


class TestGetitemFuzz(BaseTestCase):
    def _check(self, op, dense, t, msg):
        try:
            expected = (
                torch.from_numpy(np.asarray(dense).copy())[_to_torch_index(t)]
                .numpy()
            )
        except IndexError:
            return  # generator produced an out-of-range combo torch rejects
        got = op[t]
        got = got.to_dense() if isinstance(got, LinearOperator) else got
        self.assertEqual(got.shape, expected.shape, f"{msg} index={t!r}")
        self.assertAllClose(
            got, jnp.asarray(expected), rtol=1e-12, atol=1e-12,
            msg=f"{msg} index={t!r}",
        )

    def test_unbatched_matrix_dims(self):
        rng = np.random.default_rng(101)
        for trial in range(60):
            n = int(rng.integers(3, 8))
            op = _make_op(rng, n)
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} n={n}"
            t = (_rand_index(rng, n), _rand_index(rng, n))
            self._check(op, dense, t, msg)

    def test_unbatched_partial_and_ellipsis(self):
        rng = np.random.default_rng(202)
        for trial in range(40):
            n = int(rng.integers(3, 8))
            op = _make_op(rng, n)
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} n={n}"
            form = trial % 4
            if form == 0:  # single index → rows
                t = (_rand_index(rng, n),)
            elif form == 1:  # ellipsis prefix
                t = (Ellipsis, _rand_index(rng, n))
            elif form == 2:  # ellipsis between
                t = (_rand_index(rng, n), Ellipsis)
            else:  # newaxis up front
                t = (None, _rand_index(rng, n), _rand_index(rng, n))
            self._check(op, dense, t, msg)

    def test_batched_all_dims(self):
        rng = np.random.default_rng(303)
        for trial in range(90):
            n = int(rng.integers(3, 6))
            # 3-batch-dim cases reach the int/slice/array placement corner
            # where numpy (ints-as-advanced) and torch (ints-basic) diverge
            batch = ((2, 3), (4,), (2, 3, 4))[trial % 3]
            op = _make_op(rng, n, batch)
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} batch={batch} n={n}"
            idx = [
                _rand_index(rng, b, kinds=("slice", "int", "array")) for b in batch
            ]
            row = _rand_index(rng, n)
            col = _rand_index(rng, n)
            t = (*idx, row, col)
            self._check(op, dense, t, msg)

    def test_matrix_dim_pair_arrays_broadcast(self):
        """Two index arrays on the matrix dims broadcast jointly (numpy
        advanced semantics): paired same-length, column vs row, and scalars."""
        rng = np.random.default_rng(404)
        for trial in range(30):
            n = int(rng.integers(3, 7))
            op = _make_op(rng, n)
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} n={n}"
            k = int(rng.integers(1, n + 1))
            rows = jnp.asarray(rng.integers(0, n, (k,)), jnp.int32)
            cols = jnp.asarray(rng.integers(0, n, (k,)), jnp.int32)
            form = trial % 3
            if form == 0:  # paired
                t = (rows, cols)
            elif form == 1:  # outer via shape (k,1) x (m,)
                m = int(rng.integers(1, n + 1))
                cols2 = jnp.asarray(rng.integers(0, n, (m,)), jnp.int32)
                t = (rows[:, None], cols2)
            else:  # scalar-array + array
                t = (rows, jnp.asarray(int(rng.integers(0, n)), jnp.int32))
            self._check(op, dense, t, msg)

    def test_bool_masks_all_dims(self):
        """1-D boolean masks on any dim (converted to integer indices,
        torch/numpy semantics) — the class of bug the round-3 fix closed."""
        rng = np.random.default_rng(606)
        for trial in range(40):
            n = int(rng.integers(3, 7))
            if trial % 2 == 0:
                op = _make_op(rng, n)
                dims = (n, n)
                t = tuple(
                    _rand_index(rng, s, kinds=("slice", "bool", "array", "int"))
                    for s in dims
                )
            else:
                batch = (3,)
                op = _make_op(rng, n, batch)
                t = (
                    _rand_index(rng, 3, kinds=("slice", "bool")),
                    _rand_index(rng, n, kinds=("slice", "bool", "int")),
                    _rand_index(rng, n, kinds=("slice", "bool", "array")),
                )
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} bool-mask"
            self._check(op, dense, t, msg)

    def test_newaxis_positions_including_after_int(self):
        """None/newaxis at every batch position, including AFTER integer
        indices (the output-position bug the round-3 fix closed)."""
        rng = np.random.default_rng(707)
        for trial in range(40):
            n = int(rng.integers(3, 6))
            batch = (2, 3)
            op = _make_op(rng, n, batch)
            dense = op.to_dense()
            msg = f"trial {trial}: {type(op).__name__} newaxis"
            idx = [
                _rand_index(rng, b, kinds=("slice", "int", "array")) for b in batch
            ] + [_rand_index(rng, n), _rand_index(rng, n)]
            # insert None ANYWHERE (incl. between advanced indices — block
            # front-migration — and inside/after the matrix dims)
            pos = int(rng.integers(0, len(idx) + 1))
            idx.insert(pos, None)
            if trial % 3 == 0:  # occasionally two Nones
                idx.insert(int(rng.integers(0, len(idx) + 1)), None)
            self._check(op, dense, tuple(idx), msg)

    def test_toeplitz_lazy_slices_stay_lazy_and_correct(self):
        rng = np.random.default_rng(505)
        for trial in range(10):
            n = int(rng.integers(4, 9))
            col = jnp.exp(-0.5 * (jnp.arange(n, dtype=DTYPE) * 0.7) ** 2)
            op = ToeplitzLinearOperator(col)
            dense = op.to_dense()
            t = (_rand_slice(rng, n), _rand_slice(rng, n))
            got = op[t]
            msg = f"trial {trial}: Toeplitz n={n} index={t!r}"
            assert isinstance(got, LinearOperator), msg  # slices stay lazy
            self.assertAllClose(
                got.to_dense(), jnp.asarray(np.asarray(dense)[t]),
                rtol=1e-12, atol=1e-12, msg=msg,
            )


if __name__ == "__main__":
    unittest.main()
