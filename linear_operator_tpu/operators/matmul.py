"""Lazy product A @ B.

Reference: linear_operator/operators/matmul_linear_operator.py:24-144.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ..utils.broadcasting import matmul_broadcast_shape
from ._linear_operator import LinearOperator


@operator_class
class MatmulLinearOperator(LinearOperator):
    left: LinearOperator
    right: LinearOperator

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return self.left._matmul(self.right._matmul(rhs))

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self.right._t_matmul(self.left._t_matmul(rhs))

    def _shape(self) -> tuple[int, ...]:
        return matmul_broadcast_shape(self.left.shape, self.right.shape)

    def _transpose(self) -> "MatmulLinearOperator":
        return MatmulLinearOperator(
            self.right._transpose(), self.left._transpose()
        )

    def _diagonal(self) -> jax.Array:
        # diag(A B) = sum(A * B^T, axis=-1) (reference :70-83).
        left = self.left.to_dense()
        right = self.right.to_dense()
        return jnp.einsum("...ij,...ji->...i", left, right)

    def to_dense(self) -> jax.Array:
        return jnp.matmul(self.left.to_dense(), self.right.to_dense())

    def _expand_batch(self, batch_shape):
        return MatmulLinearOperator(
            self.left._expand_batch(batch_shape),
            self.right._expand_batch(batch_shape),
        )

    def _getitem(self, row_index, col_index, *batch_indices):
        return MatmulLinearOperator(
            self.left._getitem(row_index, slice(None), *batch_indices),
            self.right._getitem(slice(None), col_index, *batch_indices),
        )
