"""Grid-structured interpolated operator: W_l K_grid W_r^T with Kronecker rows.

TPU-native specialization of InterpolatedLinearOperator for SKI / KISS-GP
(reference linear_operator/operators/interpolated_linear_operator.py:20-490
always stores flat (n, k^D) sparse rows and applies them with gathers and
scatter-adds).  When the interpolation rows are Kronecker products of per-dim
stencils — which is exactly how utils/interpolation.py:9-81 builds them for
regular grids — both W directions can instead run as dense one-hot MXU
contractions (utils/grid_interp.py), avoiding all dynamic indexing, which on
this hardware is DMA-floor bound (43 ms scatter / 31 ms gather at n=200k,
grid 256^2 — see BASELINE.md).

Pointwise paths (_diagonal, _get_indices, getitem) delegate to the flat
InterpolatedLinearOperator, constructed lazily from the same stencils.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .._pytree import operator_class, static_field
from ..utils.grid_interp import (
    flatten_grid_interp,
    grid_interp_feasible,
    grid_matmul,
    grid_t_matmul,
)
from ._linear_operator import LinearOperator
from .interpolated import InterpolatedLinearOperator


@operator_class
class GridInterpolatedLinearOperator(LinearOperator):
    base: LinearOperator  # (M, M) grid operator, M = prod(sizes)
    left_indices: tuple  # per-dim (n_l, k_d) int arrays
    left_values: tuple  # per-dim (n_l, k_d)
    right_indices: tuple  # per-dim (n_r, k_d)
    right_values: tuple
    sizes: tuple = static_field()  # per-dim grid sizes (static ints)

    def __post_init__(self):
        if math.prod(self.sizes) != self.base.shape[-1]:
            raise ValueError(
                f"grid sizes {self.sizes} do not match base shape {self.base.shape}"
            )
        if len(self.left_indices) != len(self.sizes) or len(
            self.right_indices
        ) != len(self.sizes):
            raise ValueError("need one index/value stencil per grid dimension")

    # -- structure ----------------------------------------------------------

    def _shape(self) -> tuple[int, ...]:
        return (self.left_indices[0].shape[0], self.right_indices[0].shape[0])

    def _transpose(self) -> "GridInterpolatedLinearOperator":
        return GridInterpolatedLinearOperator(
            self.base._transpose(),
            self.right_indices,
            self.right_values,
            self.left_indices,
            self.left_values,
            self.sizes,
        )

    def flat(self) -> InterpolatedLinearOperator:
        """The equivalent flat-stencil operator (reference representation)."""
        li, lv = flatten_grid_interp(self.left_indices, self.left_values, self.sizes)
        ri, rv = flatten_grid_interp(
            self.right_indices, self.right_values, self.sizes
        )
        return InterpolatedLinearOperator(self.base, li, lv, ri, rv)

    # -- mat-vec engine ------------------------------------------------------

    def _use_onehot(self, t: int) -> bool:
        return grid_interp_feasible(self.sizes, t)

    @staticmethod
    def _fold_batch(fn, vec: jax.Array) -> jax.Array:
        """Apply an unbatched (rows, t) kernel, folding leading batch dims of
        ``vec`` into extra columns (W is unbatched, so this is exact)."""
        if vec.ndim == 2:
            return fn(vec)
        lead = vec.shape[:-2]
        rows, t = vec.shape[-2:]
        folded = jnp.moveaxis(vec.reshape(-1, rows, t), 0, -1).reshape(rows, -1)
        out = fn(folded)
        out = out.reshape(out.shape[0], t, -1)
        return jnp.moveaxis(out, -1, 0).reshape(*lead, out.shape[0], t)

    def _apply_w(self, indices, values, grid_vec: jax.Array) -> jax.Array:
        """W @ grid_vec: (*b, M, t) -> (*b, n, t)."""
        return self._fold_batch(
            lambda v: grid_matmul(indices, values, v, self.sizes), grid_vec
        )

    def _apply_wt(self, indices, values, vec: jax.Array) -> jax.Array:
        """W^T @ vec: (*b, n, t) -> (*b, M, t)."""
        return self._fold_batch(
            lambda v: grid_t_matmul(indices, values, v, self.sizes), vec
        )

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        if not self._use_onehot(rhs.shape[-1]):
            return self.flat()._matmul(rhs)
        y = self._apply_wt(self.right_indices, self.right_values, rhs)
        y = self.base._matmul(y)
        return self._apply_w(self.left_indices, self.left_values, y)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        if not self._use_onehot(rhs.shape[-1]):
            return self.flat()._t_matmul(rhs)
        y = self._apply_wt(self.left_indices, self.left_values, rhs)
        y = self.base._t_matmul(y)
        return self._apply_w(self.right_indices, self.right_values, y)

    # -- pointwise paths (delegate to the flat representation) ---------------

    def _diagonal(self) -> jax.Array:
        return self.flat()._diagonal()

    def to_dense(self) -> jax.Array:
        return self.flat().to_dense()

    def _getitem(self, row_index, col_index, *batch_indices):
        if batch_indices:
            return self.flat()._getitem(row_index, col_index, *batch_indices)
        return GridInterpolatedLinearOperator(
            self.base,
            tuple(i[row_index] for i in self.left_indices),
            tuple(v[row_index] for v in self.left_values),
            tuple(i[col_index] for i in self.right_indices),
            tuple(v[col_index] for v in self.right_values),
            self.sizes,
        )

    def _get_indices(self, row_index, col_index, *batch_indices):
        return self.flat()._get_indices(row_index, col_index, *batch_indices)
