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

    def __post_init__(self):
        # Accept raw array factors like the reference constructor
        # (matmul_linear_operator.py:25-27); unflatten bypasses this.
        from ._linear_operator import to_linear_operator

        for name in ("left", "right"):
            val = getattr(self, name)
            if not isinstance(val, LinearOperator):
                object.__setattr__(self, name, to_linear_operator(val))

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
        # Diagonal factors densify by elementwise row/col scaling instead of
        # a materialized diag matmul (reference matmul_linear_operator.py's
        # diag optimization, test/operators/test_matmul_linear_operator.py:59-108).
        from .diag import DiagLinearOperator

        left, right = self.left, self.right
        if isinstance(left, DiagLinearOperator) and not isinstance(
            right, DiagLinearOperator
        ):
            return left._diagonal()[..., :, None] * right.to_dense()
        if isinstance(right, DiagLinearOperator):
            return left.to_dense() * right._diagonal()[..., None, :]
        return jnp.matmul(left.to_dense(), right.to_dense())

    def _expand_batch(self, batch_shape):
        return MatmulLinearOperator(
            self.left._expand_batch(batch_shape),
            self.right._expand_batch(batch_shape),
        )

    def _getitem(self, row_index, col_index, *batch_indices):
        # expand factors with fewer/broadcast batch dims to the product's
        # batch before applying batch indices
        left, right = self.left, self.right
        if batch_indices:
            left = left._expanded_to(self.batch_shape)
            right = right._expanded_to(self.batch_shape)
        return MatmulLinearOperator(
            left._getitem(row_index, slice(None), *batch_indices),
            right._getitem(slice(None), col_index, *batch_indices),
        )
