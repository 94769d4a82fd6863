"""c * K with batch-broadcast constants.

Reference: linear_operator/operators/constant_mul_linear_operator.py:14-191.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ..utils.broadcasting import broadcast_shapes
from ._linear_operator import LinearOperator


@operator_class
class ConstantMulLinearOperator(LinearOperator):
    base: LinearOperator
    constant: jax.Array  # scalar or batch-shaped

    @property
    def _symmetric_hint(self) -> bool:
        return self.base._symmetric_hint

    @property
    def _expanded_constant(self) -> jax.Array:
        c = self.constant
        return c.reshape(c.shape + (1, 1)) if c.ndim else c

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return self._expanded_constant * self.base._matmul(rhs)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._expanded_constant * self.base._t_matmul(rhs)

    def _matmul_closure(self):
        base_mm = self.base._matmul_closure()
        c = self._expanded_constant
        return lambda rhs: c * base_mm(rhs)

    def _shape(self) -> tuple[int, ...]:
        batch = broadcast_shapes(self.base.batch_shape, jnp.shape(self.constant))
        return (*batch, *self.base.matrix_shape)

    def _transpose(self) -> "ConstantMulLinearOperator":
        return ConstantMulLinearOperator(self.base._transpose(), self.constant)

    def _diagonal(self) -> jax.Array:
        c = self.constant
        c = c.reshape(c.shape + (1,)) if c.ndim else c
        return c * self.base._diagonal()

    def to_dense(self) -> jax.Array:
        return self._expanded_constant * self.base.to_dense()

    def _solve_structure(self, rhs: jax.Array):
        base_solve = self.base._solve_structure(rhs / self._expanded_constant)
        return base_solve

    def _logdet_structure(self):
        ld = self.base._logdet_structure()
        if ld is None:
            return None
        n = self.shape[-1]
        return ld + n * jnp.log(jnp.broadcast_to(self.constant, self.batch_shape))

    def _root_structure(self):
        root = self.base.root_decomposition().root
        return ConstantMulLinearOperator(root, jnp.sqrt(self.constant))

    def mul(self, other):
        if not isinstance(other, LinearOperator):
            other = jnp.asarray(other)
            if other.ndim == 0 or other.ndim <= self.ndim - 2:
                return ConstantMulLinearOperator(self.base, self.constant * other)
        return super().mul(other)

    def _expand_batch(self, batch_shape):
        c = self.constant
        if c.ndim:
            c = jnp.broadcast_to(c, batch_shape)
        return ConstantMulLinearOperator(self.base._expand_batch(batch_shape), c)

    def _indexed_constant(self, batch_indices):
        """Constant broadcast to the operator's batch shape before batch
        indexing (the raw constant may carry fewer/singleton batch dims)."""
        c = self.constant
        if c.ndim and batch_indices:
            c = jnp.broadcast_to(c, self.batch_shape)[tuple(batch_indices)]
        return c

    def _batch_expanded_base(self):
        return self.base._expanded_to(self.batch_shape)

    def _getitem(self, row_index, col_index, *batch_indices):
        return ConstantMulLinearOperator(
            self._batch_expanded_base()._getitem(
                row_index, col_index, *batch_indices
            ),
            self._indexed_constant(batch_indices),
        )

    def _get_indices(self, row_index, col_index, *batch_indices):
        return self._indexed_constant(batch_indices) * self._batch_expanded_base()._get_indices(
            row_index, col_index, *batch_indices
        )
