"""Interpolated operator: W_left K W_right^T (SKI / KISS-GP backbone).

Reference: linear_operator/operators/interpolated_linear_operator.py:20-490,
utils/interpolation.py:9-81, utils/sparse.py:9-128.

W_left (*b, n_l, M) and W_right (*b, n_r, M) are interpolation matrices with
k nonzeros per row, stored as (indices, values) pairs; applications are
gathers/scatter-adds (utils/sparse.py here), and the inducing-grid operator K
keeps its own structure (typically Toeplitz/Kronecker for grids).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ..utils.sparse import left_interp, left_t_interp
from ._linear_operator import LinearOperator


class InterpolationMatrix(NamedTuple):
    """A fixed-sparsity row-interpolation matrix W: (*b, rows, grid_size)."""

    indices: jax.Array  # (*b, rows, k) int
    values: jax.Array  # (*b, rows, k)
    grid_size: int

    def matmul(self, rhs: jax.Array) -> jax.Array:
        return left_interp(self.indices, self.values, rhs)

    def t_matmul(self, rhs: jax.Array) -> jax.Array:
        return left_t_interp(self.indices, self.values, rhs, self.grid_size)


@operator_class
class InterpolatedLinearOperator(LinearOperator):
    base: LinearOperator  # (*b, M, M) inducing-grid operator
    left_indices: jax.Array  # (*b, n_l, k)
    left_values: jax.Array
    right_indices: jax.Array  # (*b, n_r, k)
    right_values: jax.Array

    @property
    def _left(self) -> InterpolationMatrix:
        return InterpolationMatrix(
            self.left_indices, self.left_values, self.base.shape[-2]
        )

    @property
    def _right(self) -> InterpolationMatrix:
        return InterpolationMatrix(
            self.right_indices, self.right_values, self.base.shape[-1]
        )

    def _shape(self) -> tuple[int, ...]:
        batch = jnp.broadcast_shapes(
            self.base.batch_shape,
            self.left_indices.shape[:-2],
            self.right_indices.shape[:-2],
        )
        return (*batch, self.left_indices.shape[-2], self.right_indices.shape[-2])

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        # W_l K W_r^T rhs: scatter, base matmul, gather (reference :192-250)
        y = self._right.t_matmul(rhs)
        y = self.base._matmul(y)
        return self._left.matmul(y)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        y = self._left.t_matmul(rhs)
        y = self.base._t_matmul(y)
        return self._right.matmul(y)

    def _transpose(self) -> "InterpolatedLinearOperator":
        return InterpolatedLinearOperator(
            self.base._transpose(),
            self.right_indices,
            self.right_values,
            self.left_indices,
            self.left_values,
        )

    def _diagonal(self) -> jax.Array:
        """diag = sum_{a,b} wl[i,a] wr[i,b] K[il[i,a], ir[i,b]] — k^2 gathers
        through the base's pointwise access (reference :~260)."""
        li = self.left_indices  # (*b, n, k)
        ri = self.right_indices
        lv = self.left_values
        rv = self.right_values
        bs = self.batch_shape
        n, k = li.shape[-2], li.shape[-1]
        rows = li[..., :, :, None]  # (*b, n, k, 1)
        cols = ri[..., :, None, :]  # (*b, n, 1, k)
        rows_b = jnp.broadcast_to(rows, (*bs, n, k, k))
        cols_b = jnp.broadcast_to(cols, (*bs, n, k, k))
        batch_arrs = []
        for i, b in enumerate(bs):
            shape = [1] * (len(bs) + 3)
            shape[i] = b
            batch_arrs.append(
                jnp.broadcast_to(jnp.arange(b).reshape(shape), (*bs, n, k, k))
            )
        vals = self.base._get_indices(rows_b, cols_b, *batch_arrs)
        w = lv[..., :, :, None] * rv[..., :, None, :]
        return jnp.sum(vals * w, axis=(-2, -1))

    def to_dense(self) -> jax.Array:
        base = self.base.to_dense()
        y = self._left.matmul(base)  # (*b, n_l, M)
        wr_dense = _interp_to_dense(self._right)
        return y @ jnp.swapaxes(wr_dense, -1, -2)

    def _batch_expanded_interp(self):
        """Interp index/value arrays broadcast to the operator's batch shape
        (they may carry fewer/singleton batch dims than the joint batch)."""
        batch = self.batch_shape

        def bx(a):
            want = (*batch, *a.shape[-2:])
            return a if a.shape == want else jnp.broadcast_to(a, want)

        return (
            bx(self.left_indices),
            bx(self.left_values),
            bx(self.right_indices),
            bx(self.right_values),
        )

    def _getitem(self, row_index, col_index, *batch_indices):
        li_a, lv_a, ri_a, rv_a = (
            self._batch_expanded_interp()
            if batch_indices
            else (
                self.left_indices,
                self.left_values,
                self.right_indices,
                self.right_values,
            )
        )
        base = self.base
        if batch_indices and base.batch_shape:
            # the base's own batch dims must be indexed too
            base = base._expanded_to(self.batch_shape)._getitem(
                slice(None), slice(None), *batch_indices
            )
        return InterpolatedLinearOperator(
            base,
            li_a[(*batch_indices, row_index, slice(None))],
            lv_a[(*batch_indices, row_index, slice(None))],
            ri_a[(*batch_indices, col_index, slice(None))],
            rv_a[(*batch_indices, col_index, slice(None))],
        )

    def _get_indices(self, row_index, col_index, *batch_indices):
        li_a, lv_a, ri_a, rv_a = (
            self._batch_expanded_interp()
            if batch_indices
            else (
                self.left_indices,
                self.left_values,
                self.right_indices,
                self.right_values,
            )
        )
        li = li_a[(*batch_indices, row_index, slice(None))]
        lv = lv_a[(*batch_indices, row_index, slice(None))]
        ri = ri_a[(*batch_indices, col_index, slice(None))]
        rv = rv_a[(*batch_indices, col_index, slice(None))]
        rows = li[..., :, None]
        cols = ri[..., None, :]
        shape = jnp.broadcast_shapes(rows.shape, cols.shape)
        b_arrs = [
            jnp.broadcast_to(b[..., None, None], shape) for b in batch_indices
        ] if batch_indices and any(jnp.ndim(b) for b in batch_indices) else [
            jnp.broadcast_to(jnp.asarray(b), shape) for b in batch_indices
        ]
        # the base must carry the joint batch before absorbing batch indices
        # (a narrower/singleton base batch would be silently mis-gathered)
        base = (
            self.base._expanded_to(self.batch_shape)
            if batch_indices
            else self.base
        )
        vals = base._get_indices(
            jnp.broadcast_to(rows, shape), jnp.broadcast_to(cols, shape), *b_arrs
        )
        w = lv[..., :, None] * rv[..., None, :]
        return jnp.sum(vals * w, axis=(-2, -1))


def _interp_to_dense(w: InterpolationMatrix) -> jax.Array:
    rows, k = w.indices.shape[-2], w.indices.shape[-1]
    batch = jnp.broadcast_shapes(w.indices.shape[:-2], w.values.shape[:-2])
    out = jnp.zeros((*batch, rows, w.grid_size), w.values.dtype)
    # scatter with EXPLICIT batch iotas: `out.at[..., row_ids, indices]`
    # would treat a batched indices array as a free broadcast dim (adding
    # every batch's values into every batch slice) instead of aligning it
    # with out's batch
    full = (*batch, rows, k)
    bidx = []
    for i, b in enumerate(batch):
        shape = [1] * (len(batch) + 2)
        shape[i] = b
        bidx.append(jnp.broadcast_to(jnp.arange(b).reshape(shape), full))
    row_ids = jnp.broadcast_to(jnp.arange(rows)[:, None], full)
    return out.at[(*bidx, row_ids, jnp.broadcast_to(w.indices, full))].add(
        jnp.broadcast_to(w.values, full)
    )
