"""Diagonal operators: O(N) everything.

Reference: linear_operator/operators/diag_linear_operator.py:16-434
(``DiagLinearOperator`` :16, ``ConstantDiagLinearOperator`` :303).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import operator_class, static_field
from ._linear_operator import LinearOperator


@operator_class
class DiagLinearOperator(LinearOperator):
    diag: jax.Array  # (*b, n)

    @property
    def _symmetric_hint(self) -> bool:
        return True

    @property
    def _inherently_triangular(self) -> bool:
        return True

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return self.diag[..., :, None] * rhs

    def _t_matmul(self, rhs: jax.Array) -> jax.Array:
        return self._matmul(rhs)

    def _shape(self) -> tuple[int, ...]:
        return (*self.diag.shape, self.diag.shape[-1])

    def _transpose(self) -> "DiagLinearOperator":
        return self

    def _diagonal(self) -> jax.Array:
        return self.diag

    def to_dense(self) -> jax.Array:
        n = self.diag.shape[-1]
        return self.diag[..., :, None] * jnp.eye(n, dtype=self.diag.dtype)

    # -- structure-aware math (reference :47-51, :161-191, :232) ----------

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        return rhs / self.diag[..., :, None]

    def _logdet_structure(self) -> jax.Array:
        return jnp.sum(jnp.log(self.diag), axis=-1)

    def _inv_quad_logdet_structure(self, rhs, logdet):
        if rhs is None:
            iq = jnp.zeros(self.batch_shape, dtype=self.dtype)
        else:
            iq = jnp.sum(rhs * rhs / self.diag[..., :, None], axis=-2)
        ld = (
            self._logdet_structure()
            if logdet
            else jnp.zeros(self.batch_shape, dtype=self.dtype)
        )
        return iq, ld

    def _cholesky_impl(self, upper: bool = False) -> LinearOperator:
        from .triangular import TriangularLinearOperator

        return TriangularLinearOperator(
            DiagLinearOperator(jnp.sqrt(self.diag)), upper=upper
        )

    def _root_structure(self) -> LinearOperator:
        return DiagLinearOperator(jnp.sqrt(self.diag))

    def _root_inv_structure(self) -> LinearOperator:
        return DiagLinearOperator(jax.lax.rsqrt(self.diag))

    def inverse(self) -> "DiagLinearOperator":
        return DiagLinearOperator(1.0 / self.diag)

    def exp(self) -> "DiagLinearOperator":
        return DiagLinearOperator(jnp.exp(self.diag))

    def log(self) -> "DiagLinearOperator":
        return DiagLinearOperator(jnp.log(self.diag))

    def abs(self) -> "DiagLinearOperator":
        return DiagLinearOperator(jnp.abs(self.diag))

    def sqrt(self) -> "DiagLinearOperator":
        return DiagLinearOperator(jnp.sqrt(self.diag))

    def solve_triangular(
        self,
        rhs: jax.Array,
        *,
        upper: bool,
        left: bool = True,
        unitriangular: bool = False,
    ) -> jax.Array:
        """A diagonal matrix is both upper and lower triangular, so ``upper``
        is irrelevant (reference diag_linear_operator.py:242-251).  With
        ``unitriangular`` the diagonal is treated as ones; like the
        reference, a concretely non-unit diagonal is rejected (the check is
        skipped for tracers — it is data-dependent)."""
        if unitriangular:
            if not isinstance(self.diag, jax.core.Tracer) and not bool(
                jnp.all(self._diagonal() == 1)
            ):
                raise RuntimeError(
                    "Received `unitriangular=True` but `LinearOperator` does "
                    "not have a unit diagonal."
                )
            return rhs
        d = self._diagonal()
        if rhs.ndim == 1:
            return rhs / d
        return rhs / (d[..., :, None] if left else d[..., None, :])

    # -- composition special cases (reference :203-224) -------------------

    def matmul(self, other):
        if isinstance(other, DiagLinearOperator):
            return DiagLinearOperator(self.diag * other.diag)
        from .dense import DenseLinearOperator
        from .triangular import TriangularLinearOperator

        if isinstance(other, DenseLinearOperator):
            return DenseLinearOperator(self.diag[..., :, None] * other.tensor)
        if isinstance(other, TriangularLinearOperator):
            return TriangularLinearOperator(
                self.matmul(other._tensor), upper=other.upper
            )
        from .block import BlockDiagLinearOperator

        if isinstance(other, BlockDiagLinearOperator):
            # D @ blockdiag(B_1..B_k) = blockdiag(D_1 B_1, .., D_k B_k)
            # (reference diag_linear_operator.py:217-223).
            diag = self._diagonal().reshape(*other.base.shape[:-1])
            return BlockDiagLinearOperator(DiagLinearOperator(diag).matmul(other.base))
        return super().matmul(other)

    def __add__(self, other):
        if isinstance(other, DiagLinearOperator):
            return DiagLinearOperator(self.diag + other.diag)
        if isinstance(other, LinearOperator):
            return other.add_diagonal(self.diag)
        return super().__add__(other)

    def mul(self, other):
        if isinstance(other, DiagLinearOperator):
            return DiagLinearOperator(self.diag * other.diag)
        return super().mul(other)

    def _expand_batch(self, batch_shape) -> "DiagLinearOperator":
        n = self.diag.shape[-1]
        return DiagLinearOperator(jnp.broadcast_to(self.diag, (*batch_shape, n)))

    def _unsqueeze_batch(self, dim: int) -> "DiagLinearOperator":
        return DiagLinearOperator(jnp.expand_dims(self.diag, dim))

    def _getitem(self, row_index, col_index, *batch_indices) -> LinearOperator:
        if (
            isinstance(row_index, slice)
            and isinstance(col_index, slice)
            and row_index == col_index
        ):
            return DiagLinearOperator(self.diag[(*batch_indices, row_index)])
        return super()._getitem(row_index, col_index, *batch_indices)

    def _get_indices(self, row_index, col_index, *batch_indices) -> jax.Array:
        vals = self.diag[(*batch_indices, row_index)]
        return jnp.where(row_index == col_index, vals, jnp.zeros_like(vals))

    def zero_mean_mvn_samples(self, num_samples, *, key=None):
        from ._linear_operator import _fallback_key

        key = _fallback_key(key)
        base = jax.random.normal(
            key, (num_samples, *self.batch_shape, self.shape[-1]), dtype=self.dtype
        )
        return base * jnp.sqrt(self.diag)


@operator_class
class ConstantDiagLinearOperator(DiagLinearOperator):
    """c * I with batched constants (reference diag_linear_operator.py:303-434).

    ``diag`` stores the constant with trailing singleton: (*b, 1).
    """

    diag_shape: int = static_field(default=1)

    @property
    def constant(self) -> jax.Array:
        return self.diag

    def _shape(self) -> tuple[int, ...]:
        return (*self.diag.shape[:-1], self.diag_shape, self.diag_shape)

    def _diagonal(self) -> jax.Array:
        return jnp.broadcast_to(self.diag, (*self.diag.shape[:-1], self.diag_shape))

    def _matmul(self, rhs: jax.Array) -> jax.Array:
        return self.diag[..., :, None] * rhs

    def _solve_structure(self, rhs: jax.Array) -> jax.Array:
        return rhs / self.diag[..., :, None]

    def _logdet_structure(self) -> jax.Array:
        return self.diag_shape * jnp.log(self.diag[..., 0])

    def _inv_quad_logdet_structure(self, rhs, logdet):
        if rhs is None:
            iq = jnp.zeros(self.batch_shape, dtype=self.dtype)
        else:
            iq = jnp.sum(rhs * rhs / self.diag[..., :, None], axis=-2)
        ld = (
            self._logdet_structure()
            if logdet
            else jnp.zeros(self.batch_shape, dtype=self.dtype)
        )
        return iq, ld

    def to_dense(self) -> jax.Array:
        return self.diag[..., :, None] * jnp.eye(self.diag_shape, dtype=self.dtype)

    def _cholesky_impl(self, upper: bool = False):
        from .triangular import TriangularLinearOperator

        return TriangularLinearOperator(
            ConstantDiagLinearOperator(jnp.sqrt(self.diag), diag_shape=self.diag_shape),
            upper=upper,
        )

    def _root_structure(self):
        return ConstantDiagLinearOperator(
            jnp.sqrt(self.diag), diag_shape=self.diag_shape
        )

    def _root_inv_structure(self):
        return ConstantDiagLinearOperator(
            jax.lax.rsqrt(self.diag), diag_shape=self.diag_shape
        )

    def inverse(self) -> "ConstantDiagLinearOperator":
        return ConstantDiagLinearOperator(1.0 / self.diag, diag_shape=self.diag_shape)

    def sqrt(self) -> "ConstantDiagLinearOperator":
        return ConstantDiagLinearOperator(
            jnp.sqrt(self.diag), diag_shape=self.diag_shape
        )

    def __add__(self, other):
        if isinstance(other, ConstantDiagLinearOperator):
            return ConstantDiagLinearOperator(
                self.diag + other.diag, diag_shape=self.diag_shape
            )
        if isinstance(other, DiagLinearOperator):
            return DiagLinearOperator(self._diagonal() + other.diag)
        return super().__add__(other)

    def mul(self, other):
        if isinstance(other, ConstantDiagLinearOperator):
            return ConstantDiagLinearOperator(
                self.diag * other.diag, diag_shape=self.diag_shape
            )
        return super().mul(other)

    def _expand_batch(self, batch_shape):
        return ConstantDiagLinearOperator(
            jnp.broadcast_to(self.diag, (*batch_shape, 1)), diag_shape=self.diag_shape
        )

    def _unsqueeze_batch(self, dim: int):
        return ConstantDiagLinearOperator(
            jnp.expand_dims(self.diag, dim), diag_shape=self.diag_shape
        )

    def _getitem(self, row_index, col_index, *batch_indices):
        if (
            isinstance(row_index, slice)
            and isinstance(col_index, slice)
            and row_index == col_index
        ):
            new_n = len(range(*row_index.indices(self.diag_shape)))
            return ConstantDiagLinearOperator(
                self.diag[(*batch_indices, slice(None))], diag_shape=new_n
            )
        return super()._getitem(row_index, col_index, *batch_indices)
