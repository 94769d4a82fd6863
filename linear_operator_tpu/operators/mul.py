"""Elementwise (Hadamard) product of two PSD operators via root decompositions.

Reference: linear_operator/operators/mul_linear_operator.py:15-162.
If A = L_A L_A^T and B = L_B L_B^T then A o B = R R^T where
R[i, (k,l)] = L_A[i,k] * L_B[i,l] (row-wise Khatri-Rao / face-splitting
product).  The mat-vec never forms R: per rhs column v,

    M = L_A^T diag(v) L_B            (r_A x r_B, one skinny matmul)
    (A o B) v = sum_l (L_A M)[:, l] * L_B[:, l]

which is the reference's trick (:51-82) expressed as two einsums — both map
onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class
from ..utils.broadcasting import broadcast_shapes
from ._linear_operator import LinearOperator


@operator_class
class MulLinearOperator(LinearOperator):
    left_root: LinearOperator  # (*b, n, rA)
    right_root: LinearOperator  # (*b, n, rB)

    @property
    def _symmetric_hint(self) -> bool:
        return True

    @staticmethod
    def from_operators(left: LinearOperator, right: LinearOperator) -> "MulLinearOperator":
        from .root import RootLinearOperator

        lr = left.root if isinstance(left, RootLinearOperator) else left.root_decomposition().root
        rr = right.root if isinstance(right, RootLinearOperator) else right.root_decomposition().root
        return MulLinearOperator(lr, rr)

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        la = self.left_root.to_dense()
        lb = self.right_root.to_dense()
        m = jnp.einsum("...nk,...nt,...nl->...tkl", la, rhs, lb)
        return jnp.einsum("...nk,...tkl,...nl->...nt", la, m, lb)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._matmul(rhs)  # symmetric

    def _shape(self) -> tuple[int, ...]:
        batch = broadcast_shapes(
            self.left_root.batch_shape, self.right_root.batch_shape
        )
        n = self.left_root.shape[-2]
        return (*batch, n, n)

    def _transpose(self) -> "MulLinearOperator":
        return self

    def _diagonal(self) -> jax.Array:
        la = self.left_root.to_dense()
        lb = self.right_root.to_dense()
        return jnp.sum(la * la, axis=-1) * jnp.sum(lb * lb, axis=-1)

    def to_dense(self) -> jax.Array:
        la = self.left_root.to_dense()
        lb = self.right_root.to_dense()
        a = jnp.matmul(la, jnp.swapaxes(la, -1, -2))
        b = jnp.matmul(lb, jnp.swapaxes(lb, -1, -2))
        return a * b

    def _root_structure(self) -> LinearOperator:
        from .dense import DenseLinearOperator

        la = self.left_root.to_dense()
        lb = self.right_root.to_dense()
        n = la.shape[-2]
        r = (la[..., :, :, None] * lb[..., :, None, :]).reshape(
            *la.shape[:-2], n, la.shape[-1] * lb.shape[-1]
        )
        return DenseLinearOperator(r)

    def _expand_batch(self, batch_shape):
        return MulLinearOperator(
            self.left_root._expand_batch(batch_shape),
            self.right_root._expand_batch(batch_shape),
        )
