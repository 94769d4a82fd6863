"""Dense operator wrapping a plain array.

Reference: linear_operator/operators/dense_linear_operator.py:11-123.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ._linear_operator import LinearOperator


@operator_class
class DenseLinearOperator(LinearOperator):
    tensor: jax.Array  # (*b, m, n)

    def __post_init__(self):
        if self.tensor.ndim < 2:
            raise ValueError("DenseLinearOperator requires ndim >= 2")

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return jnp.matmul(self.tensor, rhs)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return jnp.matmul(jnp.swapaxes(self.tensor, -1, -2), rhs)

    def _shape(self) -> tuple[int, ...]:
        return tuple(self.tensor.shape)

    def _transpose(self) -> "DenseLinearOperator":
        return DenseLinearOperator(jnp.swapaxes(self.tensor, -1, -2))

    def _diagonal(self) -> jax.Array:
        return jnp.diagonal(self.tensor, axis1=-2, axis2=-1)

    def to_dense(self) -> jax.Array:
        return self.tensor

    def _expand_batch(self, batch_shape) -> "DenseLinearOperator":
        return DenseLinearOperator(
            jnp.broadcast_to(self.tensor, (*batch_shape, *self.matrix_shape))
        )

    def _unsqueeze_batch(self, dim: int) -> "DenseLinearOperator":
        return DenseLinearOperator(jnp.expand_dims(self.tensor, dim))

    def _getitem(self, row_index, col_index, *batch_indices) -> LinearOperator:
        return DenseLinearOperator(self.tensor[(*batch_indices, row_index, col_index)])

    def _get_indices(self, row_index, col_index, *batch_indices) -> jax.Array:
        return self.tensor[(*batch_indices, row_index, col_index)]

    def _select_rows(self, idx) -> "DenseLinearOperator":
        return DenseLinearOperator(self.tensor[..., idx, :])

    def _select_cols(self, idx) -> "DenseLinearOperator":
        return DenseLinearOperator(self.tensor[..., :, idx])

    def _permute_batch(self, *dims: int) -> "DenseLinearOperator":
        nd = self.tensor.ndim
        return DenseLinearOperator(jnp.transpose(self.tensor, (*dims, nd - 2, nd - 1)))

    def __add__(self, other):
        if isinstance(other, DenseLinearOperator):
            return DenseLinearOperator(self.tensor + other.tensor)
        return super().__add__(other)
