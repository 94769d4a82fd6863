"""Zero operator — the null element of the operator algebra.

Reference: linear_operator/operators/zero_linear_operator.py:14-244.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class, static_field
from ._linear_operator import LinearOperator


@operator_class
class ZeroLinearOperator(LinearOperator):
    shape_: tuple = static_field()
    dtype_: str = static_field(default="float32")

    @property
    def dtype(self):
        return jnp.dtype(self.dtype_)

    @property
    def _inherently_triangular(self) -> bool:
        return True

    def astype(self, dtype):
        return ZeroLinearOperator(shape_=self.shape_, dtype_=jnp.dtype(dtype).name)

    def _shape(self) -> tuple[int, ...]:
        return tuple(self.shape_)

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        batch = jnp.broadcast_shapes(self.shape_[:-2], rhs.shape[:-2])
        return jnp.zeros(
            (*batch, self.shape_[-2], rhs.shape[-1]),
            dtype=jnp.result_type(self.dtype, rhs.dtype),
        )

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        batch = jnp.broadcast_shapes(self.shape_[:-2], rhs.shape[:-2])
        return jnp.zeros(
            (*batch, self.shape_[-1], rhs.shape[-1]),
            dtype=jnp.result_type(self.dtype, rhs.dtype),
        )

    def _transpose(self) -> "ZeroLinearOperator":
        return ZeroLinearOperator(
            shape_=(*self.shape_[:-2], self.shape_[-1], self.shape_[-2]),
            dtype_=self.dtype_,
        )

    def _diagonal(self) -> jax.Array:
        return jnp.zeros(
            (*self.shape_[:-2], min(self.shape_[-2:])), dtype=self.dtype
        )

    def to_dense(self) -> jax.Array:
        return jnp.zeros(self.shape_, dtype=self.dtype)

    def _solve_structure(self, rhs):
        raise RuntimeError("ZeroLinearOperator is singular; solve is undefined")

    def __add__(self, other):
        if isinstance(other, LinearOperator):
            # 0 + A = A, but broadcast up to this operator's batch shape
            # (reference zero_linear_operator.py:120-155 expands the added
            # diagonal to the Zero operator's batch).
            target = jnp.broadcast_shapes(self.batch_shape, other.batch_shape)
            if target != tuple(other.batch_shape):
                return other._expand_batch(target)
            return other
        from .dense import DenseLinearOperator

        return DenseLinearOperator(jnp.broadcast_to(jnp.asarray(other), self.shape_))

    def mul(self, other):
        return self

    def matmul(self, other):
        if isinstance(other, LinearOperator):
            return ZeroLinearOperator(
                shape_=(*self.shape_[:-1], other.shape[-1]), dtype_=self.dtype_
            )
        return super().matmul(other)

    def _expand_batch(self, batch_shape):
        return ZeroLinearOperator(
            shape_=(*batch_shape, *self.shape_[-2:]), dtype_=self.dtype_
        )

    def _getitem(self, row_index, col_index, *batch_indices):
        from ..utils.getitem import sliced_shape

        new_shape = sliced_shape(self.shape_, *batch_indices, row_index, col_index)
        return ZeroLinearOperator(shape_=new_shape, dtype_=self.dtype_)
