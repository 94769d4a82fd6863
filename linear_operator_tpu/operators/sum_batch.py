"""Sum over a block batch dimension.

Reference: linear_operator/operators/sum_batch_linear_operator.py:14-69
(used by ``LinearOperator.sum`` over batch dims, _linear_operator.py:850-862).
The base operator has an extra batch dim at position -3 which is lazily
summed out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class, static_field
from ._linear_operator import LinearOperator
from .block import BlockLinearOperator


@operator_class
class SumBatchLinearOperator(BlockLinearOperator):
    base: LinearOperator
    block_dim: int = static_field(default=-3)

    def __post_init__(self):
        if self.block_dim != -3:
            raise ValueError("block_dim must be -3 (permute batch dims first)")

    def _shape(self) -> tuple[int, ...]:
        s = self.base.shape
        return s[:-3] + s[-2:]

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return jnp.sum(self.base._matmul(rhs[..., None, :, :]), axis=-3)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return jnp.sum(self.base._t_matmul(rhs[..., None, :, :]), axis=-3)

    def _transpose(self) -> "SumBatchLinearOperator":
        return SumBatchLinearOperator(self.base._transpose(), block_dim=self.block_dim)

    def _diagonal(self) -> jax.Array:
        return jnp.sum(self.base._diagonal(), axis=-2)

    def to_dense(self) -> jax.Array:
        return jnp.sum(self.base.to_dense(), axis=-3)

    def _get_indices(self, row_index, col_index, *batch_indices):
        k = self.base.shape[-3]
        vals = self.base._get_indices(
            row_index[..., None],
            col_index[..., None],
            *[b[..., None] for b in batch_indices],
            jnp.arange(k),
        )
        return jnp.sum(vals, axis=-1)
