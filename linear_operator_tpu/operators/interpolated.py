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

    def _getitem(self, row_index, col_index, *batch_indices):
        return InterpolatedLinearOperator(
            self.base,
            self.left_indices[(*batch_indices, row_index, slice(None))],
            self.left_values[(*batch_indices, row_index, slice(None))],
            self.right_indices[(*batch_indices, col_index, slice(None))],
            self.right_values[(*batch_indices, col_index, slice(None))],
        )

    def _get_indices(self, row_index, col_index, *batch_indices):
        li = self.left_indices[(*batch_indices, row_index, slice(None))]
        lv = self.left_values[(*batch_indices, row_index, slice(None))]
        ri = self.right_indices[(*batch_indices, col_index, slice(None))]
        rv = self.right_values[(*batch_indices, col_index, slice(None))]
        rows = li[..., :, None]
        cols = ri[..., None, :]
        shape = jnp.broadcast_shapes(rows.shape, cols.shape)
        b_arrs = [
            jnp.broadcast_to(b[..., None, None], shape) for b in batch_indices
        ] if batch_indices and any(jnp.ndim(b) for b in batch_indices) else [
            jnp.broadcast_to(jnp.asarray(b), shape) for b in batch_indices
        ]
        vals = self.base._get_indices(
            jnp.broadcast_to(rows, shape), jnp.broadcast_to(cols, shape), *b_arrs
        )
        w = lv[..., :, None] * rv[..., None, :]
        return jnp.sum(vals * w, axis=(-2, -1))


def _interp_to_dense(w: InterpolationMatrix) -> jax.Array:
    rows, k = w.indices.shape[-2], w.indices.shape[-1]
    out = jnp.zeros((*w.indices.shape[:-2], rows, w.grid_size), w.values.dtype)
    row_ids = jnp.broadcast_to(
        jnp.arange(rows)[:, None], w.indices.shape[-2:]
    )
    return out.at[..., row_ids, w.indices].add(w.values)
