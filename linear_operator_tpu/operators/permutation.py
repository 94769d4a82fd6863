"""Permutation operators: P x = x[perm].

Reference: linear_operator/operators/permutation_linear_operator.py:52-199
(``PermutationLinearOperator`` :52, ``TransposePermutationLinearOperator``
:152) and utils/permutation.py:9-102.

Mat-vec = gather (reference :22-35); solve = transpose mat-vec (:101-133);
|det| = 1 so logdet = 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class, replace, static_field
from ._linear_operator import LinearOperator


@operator_class
class PermutationLinearOperator(LinearOperator):
    perm: jax.Array  # (*b, n) int — row i of P selects source index perm[i]
    dtype_: str | None = static_field(default=None)

    def _shape(self) -> tuple[int, ...]:
        return (*self.perm.shape, self.perm.shape[-1])

    @property
    def dtype(self):
        if self.dtype_ is not None:
            return jnp.dtype(self.dtype_)
        # float32 default, matching the reference (permutation_linear_
        # operator.py:98 hardcodes torch.float32): the matrix is real 0/1
        # even though the only array leaf is the integer permutation, and a
        # float32 default never upcasts f32 composites under x64
        return jnp.dtype(jnp.float32)

    def astype(self, dtype):
        return replace(self, dtype_=jnp.dtype(dtype).name)

    def _inv_perm(self) -> jax.Array:
        # argsort of a permutation is its inverse
        return jnp.argsort(self.perm, axis=-1)

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        batch = jnp.broadcast_shapes(self.perm.shape[:-1], rhs.shape[:-2])
        rhs_b = jnp.broadcast_to(rhs, (*batch, *rhs.shape[-2:]))
        idx = jnp.broadcast_to(
            self.perm[..., :, None], (*batch, self.perm.shape[-1], 1)
        )
        return jnp.take_along_axis(rhs_b, idx, axis=-2)

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._transpose()._matmul(rhs)

    def _transpose(self) -> "PermutationLinearOperator":
        return PermutationLinearOperator(self._inv_perm(), dtype_=self.dtype_)

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        """P^{-1} = P^T (reference :101-133)."""
        return self._t_matmul(rhs)

    def _logdet_structure(self) -> jax.Array:
        return jnp.zeros(self.perm.shape[:-1], dtype=self.dtype)

    def _diagonal(self) -> jax.Array:
        n = self.perm.shape[-1]
        return (self.perm == jnp.arange(n)).astype(self.dtype)

    def to_dense(self) -> jax.Array:
        n = self.perm.shape[-1]
        return jax.nn.one_hot(self.perm, n, dtype=self.dtype)

    def _get_indices(self, row_index, col_index, *batch_indices):
        sel = self.perm[(*batch_indices, row_index)]
        return (sel == col_index).astype(self.dtype)

    def inverse(self) -> "PermutationLinearOperator":
        return self._transpose()


@operator_class
class TransposePermutationLinearOperator(PermutationLinearOperator):
    """The vec-transpose permutation: maps vec(A) to vec(A^T) for m x m A
    (reference :152-199).  ``perm`` is derived from the side length."""

    @staticmethod
    def from_side(m: int) -> "TransposePermutationLinearOperator":
        i = jnp.arange(m * m)
        perm = (i % m) * m + i // m
        return TransposePermutationLinearOperator(perm)

    def _transpose(self):
        return self  # symmetric involution

    def _solve_structure(self, rhs):
        return self._matmul(rhs)
