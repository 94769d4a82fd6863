"""Row/column selection view of a base operator.

Reference: linear_operator/operators/masked_linear_operator.py:11-152.

XLA needs static shapes, so the boolean masks of the reference become
INTEGER index arrays whose lengths fix the view's shape (construct with
``MaskedLinearOperator.from_masks`` for boolean-mask parity — it converts at
construction time with numpy, outside any trace).  The mat-vec scatters the
rhs into the full space, runs the base, and gathers the selected rows
(reference :52-70) — gather/scatter instead of boolean select.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._pytree import operator_class
from ._linear_operator import LinearOperator


@operator_class
class MaskedLinearOperator(LinearOperator):
    base: LinearOperator
    row_idx: jax.Array  # (r,) int32 selected rows
    col_idx: jax.Array  # (c,) int32 selected cols

    @staticmethod
    def from_masks(base, row_mask, col_mask) -> "MaskedLinearOperator":
        row_idx = jnp.asarray(np.nonzero(np.asarray(row_mask))[0], jnp.int32)
        col_idx = jnp.asarray(np.nonzero(np.asarray(col_mask))[0], jnp.int32)
        return MaskedLinearOperator(base, row_idx, col_idx)

    def _shape(self) -> tuple[int, ...]:
        return (*self.base.batch_shape, self.row_idx.shape[0], self.col_idx.shape[0])

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        full = jnp.zeros(
            (*rhs.shape[:-2], self.base.shape[-1], rhs.shape[-1]), dtype=rhs.dtype
        )
        full = full.at[..., self.col_idx, :].set(rhs)
        out = self.base._matmul(full)
        return out[..., self.row_idx, :]

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        full = jnp.zeros(
            (*rhs.shape[:-2], self.base.shape[-2], rhs.shape[-1]), dtype=rhs.dtype
        )
        full = full.at[..., self.row_idx, :].set(rhs)
        out = self.base._t_matmul(full)
        return out[..., self.col_idx, :]

    def _transpose(self) -> "MaskedLinearOperator":
        return MaskedLinearOperator(
            self.base._transpose(), self.col_idx, self.row_idx
        )

    def _diagonal(self) -> jax.Array:
        k = min(self.row_idx.shape[0], self.col_idx.shape[0])
        bs = self.base.batch_shape
        ri = jnp.broadcast_to(self.row_idx[:k], (*bs, k))
        ci = jnp.broadcast_to(self.col_idx[:k], (*bs, k))
        return self.base._get_indices(ri, ci, *_batch_arrs(bs, k))

    def to_dense(self) -> jax.Array:
        dense = self.base.to_dense()
        return dense[..., self.row_idx, :][..., :, self.col_idx]

    def _get_indices(self, row_index, col_index, *batch_indices):
        return self.base._get_indices(
            self.row_idx[row_index], self.col_idx[col_index], *batch_indices
        )


def _batch_arrs(batch_shape, n):
    arrs = []
    for i, b in enumerate(batch_shape):
        shape = [1] * (len(batch_shape) + 1)
        shape[i] = b
        arrs.append(jnp.broadcast_to(jnp.arange(b).reshape(shape), (*batch_shape, n)))
    return arrs
